"""Host-side orchestration: item encoding, evaluation loops, the two-stage
finetune schedule, and fraud threshold-sweep evaluation.

Reference drivers: ``/root/reference/finetune.py:38-96,298-353`` and
``finetune_classification.py:140-258``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RecformerConfig
from ..data.datasets import EvalDataset, FraudDataset, SequenceDataset
from .steps import (
    make_encode_items_scan,
    make_encode_items_step,
    make_eval_scan,
    make_eval_step,
    make_finetune_step,
    make_fraud_eval_scan,
    make_fraud_eval_step,
)


def _params_fingerprint(params) -> str:
    """Cheap content fingerprint: fp64 sums of the 8 largest leaves, computed
    on device in one launch (8-float host transfer, not a full param pull)."""
    leaves = sorted(jax.tree.leaves(params), key=lambda l: -l.size)[:8]
    sums = jax.jit(lambda ls: [jnp.sum(l.astype(jnp.float64)) for l in ls])(leaves)
    return ",".join(f"{float(s):.6e}" for s in sums)


def encode_all_items(params, model, table, config: RecformerConfig,
                     batch_size: int = 256, backbone_method=None,
                     cache_path: Optional[str] = None) -> jnp.ndarray:
    """Batch-encode every catalog item as a single-item sequence and return
    the pooled ``(N, H)`` matrix (reference ``finetune.py:38-63``).

    Items are processed in fixed-size chunks (static shapes); the tail chunk
    is padded with the null item and trimmed.

    ``cache_path``: optional ``.npz`` disk cache (the reference caches the
    encoded catalog between runs, ``finetune.py:277-285``); unlike the
    reference's trust-the-path pickle, the cache stores a params fingerprint
    and re-encodes when the model changed."""
    import os

    if cache_path:
        fp = _params_fingerprint(params)
        if os.path.exists(cache_path):
            data = np.load(cache_path, allow_pickle=False)
            if str(data["fingerprint"]) == fp and int(data["n_items"]) == int(
                    table["lengths"].shape[0]) - 1:
                print(f"[encode] item-embedding cache hit: {cache_path}")
                return jnp.asarray(data["embeddings"]).astype(str(data["dtype"]))
        emb = encode_all_items(params, model, table, config, batch_size,
                               backbone_method)
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
        # stored as fp32: npz has no bfloat16, and fp32 is exact for bf16 values
        np.savez(cache_path, embeddings=np.asarray(emb.astype(jnp.float32)),
                 dtype=str(emb.dtype), fingerprint=fp,
                 n_items=np.asarray(emb).shape[0])
        return emb
    n = int(table["lengths"].shape[0]) - 1
    pad_to = ((n + batch_size - 1) // batch_size) * batch_size
    ids = np.arange(pad_to, dtype=np.int32)
    ids[n:] = 0  # pad chunk with item 0; trimmed below
    nb = pad_to // batch_size
    if nb > 1:
        # whole catalog in ONE device call (relay dispatch amortization —
        # the per-chunk loop pays ~1.8 s host dispatch per chunk)
        scan_step = make_encode_items_scan(config, model, backbone_method)
        out2d = scan_step(params, table, jnp.asarray(ids.reshape(nb, batch_size)))
        return out2d.reshape(pad_to, out2d.shape[-1])[:n]
    step = make_encode_items_step(config, model, backbone_method)
    out = []
    for c in range(0, pad_to, batch_size):
        chunk = jnp.asarray(ids[c : c + batch_size])
        out.append(step(params, table, chunk))
    return jnp.concatenate(out, axis=0)[:n]


def _scan_groups(batches, scan_chunk):
    """Split batches into fixed-size groups for scanned eval. Full groups are
    exactly ``scan_chunk`` long and the tail is padded with all-invalid copies
    of the first batch, so every group hits ONE compiled shape; a dataset
    smaller than one chunk forms a single unpadded group."""
    nb = len(batches)
    if nb <= scan_chunk:
        return [(batches, 0)]
    return [(batches[g0 : g0 + scan_chunk],
             max(0, g0 + scan_chunk - nb))
            for g0 in range(0, nb, scan_chunk)]


def _stack_field(group, pad, field):
    arrs = [getattr(b, field) for b in group]
    if pad:
        # filler batches: copies of batch 0 with valid=0 everywhere -> their
        # metric/prob contributions are exactly zero-weighted
        filler = np.zeros_like(arrs[0]) if field == "valid" else arrs[0]
        arrs = arrs + [filler] * pad
    return jnp.asarray(np.stack(arrs))


def evaluate_seqrec(params, model, table, dataset: EvalDataset, item_embeddings,
                    config: RecformerConfig, batch_size: int = 32,
                    ks: Sequence[int] = (10, 50), scan_chunk: int = 32,
                    log=None) -> Dict[str, float]:
    """Full-catalog ranked evaluation; exact (sum/count) aggregation."""
    batches = list(dataset.batches(batch_size))
    if not batches:
        return {}
    if len(batches) > 1:
        # Eval batches are shape-uniform (tail rows masked by `valid`), so
        # groups of `scan_chunk` batches run as ONE device call each:
        # lax.scan over the stacked batch axis, per-batch sums reduced on
        # device, group partials accumulated on device, one host transfer at
        # the end. A per-batch loop paid ~1.8 s of axon-relay host dispatch
        # per batch (~10 min per full eval at paper scale, 11k users / 32);
        # one monolithic scan call was unobservable through documented ~1h
        # relay hangs — chunked groups keep the amortization while giving
        # coarse progress and interruptibility (advisor r2). The scan wrapper
        # is memoized in steps.py so per-epoch evals don't re-trace.
        run = make_eval_scan(config, model, ks=ks)
        totals = None
        groups = _scan_groups(batches, scan_chunk)
        for gi, (group, pad) in enumerate(groups):
            out = run(params, table,
                      _stack_field(group, pad, "item_ids"),
                      _stack_field(group, pad, "seq_lens"),
                      _stack_field(group, pad, "labels"),
                      _stack_field(group, pad, "valid"),
                      item_embeddings)
            totals = out if totals is None else jax.tree.map(jnp.add, totals, out)
            if log is not None and len(groups) > 1:
                log(f"[eval] group {gi + 1}/{len(groups)} dispatched")
    else:
        step = make_eval_step(config, model, ks=ks)
        # accumulate on device; a single host transfer at the end (per-batch
        # float() would cost one relay round-trip each)
        totals = None
        for batch in batches:
            out = step(params, table, jnp.asarray(batch.item_ids), jnp.asarray(batch.seq_lens),
                       jnp.asarray(batch.labels), jnp.asarray(batch.valid), item_embeddings)
            totals = out if totals is None else jax.tree.map(jnp.add, totals, out)
    totals = {k: float(v) for k, v in totals.items()}
    count = totals.pop("count")
    return {k: v / max(count, 1.0) for k, v in totals.items()}


def evaluate_seqrec_sharded(params, model, table, dataset: EvalDataset, item_embeddings,
                            config: RecformerConfig, mesh, batch_size: int = 32,
                            ks: Sequence[int] = (10, 50)) -> Dict[str, float]:
    """Full-catalog eval with a row-sharded catalog: the label's exact rank is
    computed from per-shard greater-counts + psum (``parallel/catalog.py``),
    never materializing the global (B, N) score matrix on one device. Metrics
    match :func:`evaluate_seqrec` exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..data.device_pipeline import assemble_for_config
    from ..parallel.catalog import make_sharded_rank_fn
    from ..parallel.mesh import MODEL_AXIS, pad_rows_to_multiple

    n_shards = mesh.shape[MODEL_AXIS]
    emb_padded, n_items = pad_rows_to_multiple(np.asarray(item_embeddings), n_shards)
    # Padded rows are zero vectors: cosine score exactly 0. Their phantom
    # contributions to rank (0 > label_score) and valid_length are subtracted
    # exactly below.
    emb_sharded = jax.device_put(
        jnp.asarray(emb_padded), NamedSharding(mesh, P(MODEL_AXIS, None))
    )
    rank_fn = make_sharded_rank_fn(mesh, config.temp)

    ks = tuple(ks)
    n_pad = emb_padded.shape[0] - n_items
    emb_host = jnp.asarray(emb_padded)

    @jax.jit
    def batch_sums(params, item_ids, seq_lens, labels, valid):
        b = assemble_for_config(table, item_ids, seq_lens, config)
        pooled = model.apply(params, b, deterministic=True).astype(jnp.float32)
        rank, valid_len = rank_fn(pooled, emb_sharded, labels)
        # correct for zero-vector padding rows: they produce score exactly 0;
        # count how many padded rows outrank each label (score 0 > label score)
        if n_pad:
            label_emb = emb_host[labels]
            pooled_n = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)
            le = label_emb / jnp.maximum(
                jnp.linalg.norm(label_emb, axis=-1, keepdims=True), 1e-8)
            label_score = jnp.sum(pooled_n * le, axis=-1) / config.temp
            rank = rank - n_pad * (label_score < 0.0)
            valid_len = valid_len - n_pad
        w = valid.astype(jnp.float32)
        out = {}
        for k in ks:
            ind = (rank < k).astype(jnp.float32)
            out[f"NDCG@{k}"] = jnp.sum(w * ind / jnp.log2(rank + 2.0))
            out[f"Recall@{k}"] = jnp.sum(w * ind)
        out["MRR"] = jnp.sum(w / (rank + 1.0))
        out["AUC"] = jnp.sum(w * (1.0 - rank / jnp.maximum(valid_len, 1.0)))
        out["count"] = jnp.sum(w)
        return out

    # accumulate on device; ONE host transfer at the end (per-batch float()
    # costs a relay round-trip each — the device-accumulation lesson above)
    totals = None
    for batch in dataset.batches(batch_size):
        out = batch_sums(params, jnp.asarray(batch.item_ids),
                         jnp.asarray(batch.seq_lens), jnp.asarray(batch.labels),
                         jnp.asarray(batch.valid))
        totals = out if totals is None else jax.tree.map(jnp.add, totals, out)
    if totals is None:
        return {}
    totals = {k: float(v) for k, v in totals.items()}
    count = totals.pop("count")
    return {k: v / max(count, 1.0) for k, v in totals.items()}


def train_seqrec_epoch(state, step_fn, table, dataset: SequenceDataset, item_embeddings,
                       rng, batch_size: int, epoch: int,
                       multi_step=None, steps_per_call: int = 1) -> Tuple[object, float]:
    # per-step losses stay device scalars; ONE host transfer per epoch
    # (a per-step float() is a sync barrier through the axon relay)
    losses, weights = [], []
    if multi_step is not None and steps_per_call > 1:
        pending_ids, pending_lens = [], []
        for batch in dataset.batches(batch_size, shuffle=True, seed=epoch, drop_last=True):
            pending_ids.append(batch.item_ids)
            pending_lens.append(batch.seq_lens)
            if len(pending_ids) == steps_per_call:
                state, trace = multi_step(
                    state, rng, table,
                    jnp.asarray(np.stack(pending_ids)),
                    jnp.asarray(np.stack(pending_lens)), item_embeddings,
                )
                losses.append(jnp.mean(trace["loss"]))
                weights.append(steps_per_call)
                pending_ids, pending_lens = [], []
        for ids, lens in zip(pending_ids, pending_lens):  # tail batches
            state, metrics = step_fn(state, rng, table, jnp.asarray(ids),
                                     jnp.asarray(lens), item_embeddings)
            losses.append(metrics["loss"])
            weights.append(1)
    else:
        for batch in dataset.batches(batch_size, shuffle=True, seed=epoch, drop_last=True):
            state, metrics = step_fn(
                state, rng, table, jnp.asarray(batch.item_ids), jnp.asarray(batch.seq_lens),
                item_embeddings,
            )
            losses.append(metrics["loss"])
            weights.append(1)
    if not losses:
        return state, 0.0
    vals = np.asarray(jnp.stack(losses), dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    return state, float((vals * w).sum() / w.sum())


def finetune_two_stage(
    state,
    model,
    table,
    config: RecformerConfig,
    train_dataset: SequenceDataset,
    val_dataset: EvalDataset,
    test_dataset: EvalDataset,
    *,
    num_epochs: int = 16,
    batch_size: int = 16,
    eval_batch_size: int = 32,
    encode_batch_size: int = 256,
    verbose: int = 3,
    rng: Optional[jax.Array] = None,
    steps_per_call: int = 1,
    encode_cache: Optional[str] = None,
    resume_dir: Optional[str] = None,
    mirror_path: Optional[str] = None,
    log=print,
) -> Tuple[object, Dict[str, float]]:
    """The reference two-stage schedule (``finetune.py:298-353``):

    Stage 1: every epoch re-encode the catalog from the current encoder, then
    train; eval every ``verbose`` epochs on NDCG@10 with patience 5.
    Stage 2: reload the stage-1 best, keep item embeddings frozen (no
    re-encode), patience 3. Returns
    (best_state, best_item_embeddings, test_metrics) — the catalog travels
    with the params, see below.

    The ITEM CATALOG IS PART OF THE CHECKPOINT: the reference saves
    ``state_dict()`` including the ``init_item_embedding`` buffer and tests
    after ``load_state_dict`` (``finetune.py:306-353``) — the test eval runs
    against the exact embeddings the selected params were trained/selected
    with. Re-encoding the catalog at test time from the best params scores
    the sequence encoder against a pairing it was never optimized for and
    collapses test metrics toward the popularity floor (observed -62% on the
    structured synthetic corpus, round 2).

    ``resume_dir``: optional directory for rolling per-epoch checkpoints
    (TrainState + loop position + best snapshot). If it holds a prior run's
    state, training continues from the first unfinished epoch — protection
    the reference lacks (its only finetune artifacts are best-model dumps,
    ``finetune.py:315-319``); multi-hour runs survive preemption or a hung
    accelerator relay.

    ``mirror_path``: optional append-only JSONL; every dev eval row and the
    final test row are appended (fsync'd) the moment they are produced, so a
    VM recycle that wipes ``resume_dir`` loses no *numbers* (VERDICT r4
    weak #5)."""
    import json
    import os

    from ..utils.logging import append_jsonl

    rng = rng if rng is not None else jax.random.PRNGKey(42)
    step_fn = make_finetune_step(config, model)
    multi_step = None
    if steps_per_call > 1:
        from .steps import make_multi_step

        multi_step = make_multi_step(step_fn, steps_per_call)

    def encode(params, cache=None):
        return encode_all_items(params, model, table, config, encode_batch_size,
                                cache_path=cache)

    best_target = float("-inf")
    best_params = None
    best_item_embeddings = None  # snapshotted WITH the params (see docstring)
    start_stage, start_epoch = 1, 0
    patience = 5
    loop_meta = os.path.join(resume_dir, "loop.json") if resume_dir else None
    if loop_meta and os.path.exists(loop_meta):
        from .checkpoint import restore_params, restore_train_state

        with open(loop_meta) as f:
            meta = json.load(f)
        state = restore_train_state(os.path.join(resume_dir, "state"), state)
        best_target = meta["best_target"]
        patience = meta["patience"]
        start_stage = meta["stage"]
        start_epoch = meta["epoch"] + 1
        if os.path.isdir(os.path.join(resume_dir, "best_params")):
            best_params = jax.tree.map(
                np.asarray,
                restore_params(os.path.join(resume_dir, "best_params")))
            best_item_embeddings = np.load(
                os.path.join(resume_dir, "best_emb.npy"))
        log(f"[finetune] resumed at stage {start_stage} epoch {start_epoch} "
            f"(best NDCG@10 {best_target:.4f}, patience {patience})")

    def _checkpoint(stage, epoch, improved):
        """Rolling epoch checkpoint. Written AFTER the epoch's state update
        (and after the stage-1->2 transition for the stage-2 epoch=-1
        marker), so a resume restores exactly the position recorded."""
        if not resume_dir:
            return
        from .checkpoint import save_params, save_train_state

        os.makedirs(resume_dir, exist_ok=True)
        save_train_state(os.path.join(resume_dir, "state"), state)
        if improved:
            save_params(os.path.join(resume_dir, "best_params"), best_params)
            np.save(os.path.join(resume_dir, "best_emb.npy"),
                    best_item_embeddings)
        if stage == 2:
            # the frozen stage-2 catalog (saved once, at the transition)
            frozen = os.path.join(resume_dir, "frozen_emb.npy")
            if not os.path.exists(frozen):
                np.save(frozen,
                        np.asarray(item_embeddings.astype(jnp.float32)))
        with open(loop_meta, "w") as f:
            json.dump({"stage": stage, "epoch": epoch,
                       "best_target": best_target, "patience": patience,
                       "emb_dtype": str(item_embeddings.dtype)}, f)

    if start_stage == 1:
        if start_epoch == 0:
            # the initial (pre-training) encode is the one the reference
            # disk-caches between launches (finetune.py:277-285); per-epoch
            # re-encodes see fresh params every time, so caching them would
            # never hit
            item_embeddings = encode(state.params, cache=encode_cache)
        for epoch in range(start_epoch, num_epochs):
            item_embeddings = encode(state.params)
            state, loss = train_seqrec_epoch(
                state, step_fn, table, train_dataset, item_embeddings, rng, batch_size,
                epoch, multi_step=multi_step, steps_per_call=steps_per_call,
            )
            improved = False
            if (epoch + 1) % verbose == 0:
                dev = evaluate_seqrec(state.params, model, table, val_dataset,
                                      item_embeddings, config, eval_batch_size,
                                      log=log)
                log(f"[stage1] epoch {epoch} loss {loss:.4f} dev {dev}")
                append_jsonl(mirror_path,
                             {"event": "dev", "stage": 1, "epoch": epoch,
                              "loss": loss, **dev})
                if dev["NDCG@10"] > best_target:
                    best_target = dev["NDCG@10"]
                    best_params = jax.tree.map(np.asarray, state.params)
                    best_item_embeddings = np.asarray(
                        item_embeddings.astype(jnp.float32))
                    patience = 5
                    improved = True
                else:
                    patience -= 1
            _checkpoint(1, epoch, improved)
            if patience == 0:
                break

        if best_params is not None:
            state = state.replace(params=jax.tree.map(jnp.asarray, best_params))
            item_embeddings = jnp.asarray(best_item_embeddings)
        # stage 2 keeps this catalog FROZEN through training, selection, test
        patience = 3
        start_epoch = 0
        _checkpoint(2, -1, improved=False)  # the post-transition marker
    else:
        with open(loop_meta) as f:
            meta = json.load(f)
        item_embeddings = jnp.asarray(
            np.load(os.path.join(resume_dir, "frozen_emb.npy"))
        ).astype(meta.get("emb_dtype", "float32"))

    for epoch in range(start_epoch, num_epochs):
        state, loss = train_seqrec_epoch(
            state, step_fn, table, train_dataset, item_embeddings, rng, batch_size,
            num_epochs + epoch, multi_step=multi_step, steps_per_call=steps_per_call,
        )
        improved = False
        if (epoch + 1) % verbose == 0:
            dev = evaluate_seqrec(state.params, model, table, val_dataset,
                                  item_embeddings, config, eval_batch_size,
                                  log=log)
            log(f"[stage2] epoch {epoch} loss {loss:.4f} dev {dev}")
            append_jsonl(mirror_path,
                         {"event": "dev", "stage": 2, "epoch": epoch,
                          "loss": loss, **dev})
            if dev["NDCG@10"] > best_target:
                best_target = dev["NDCG@10"]
                best_params = jax.tree.map(np.asarray, state.params)
                best_item_embeddings = np.asarray(
                    item_embeddings.astype(jnp.float32))
                patience = 3
                improved = True
            else:
                patience -= 1
        _checkpoint(2, epoch, improved)
        if patience == 0:
            break

    if best_params is not None:
        state = state.replace(params=jax.tree.map(jnp.asarray, best_params))
        item_embeddings = jnp.asarray(best_item_embeddings)
    # NO re-encode: test scores against the catalog the selected params were
    # trained with (reference load_state_dict semantics, finetune.py:351-353)
    test_metrics = evaluate_seqrec(state.params, model, table, test_dataset,
                                   item_embeddings, config, eval_batch_size,
                                   log=log)
    append_jsonl(mirror_path, {"event": "test", **test_metrics})
    return state, item_embeddings, test_metrics


# ---------------------------------------------------------------------------
# Fraud evaluation (threshold sweep)
# ---------------------------------------------------------------------------

def binary_classification_metrics(probs: np.ndarray, labels: np.ndarray,
                                  threshold: float) -> Dict[str, float]:
    preds = (probs >= threshold).astype(np.int64)
    y = labels.astype(np.int64)
    tp = int(((preds == 1) & (y == 1)).sum())
    tn = int(((preds == 0) & (y == 0)).sum())
    fp = int(((preds == 1) & (y == 0)).sum())
    fn = int(((preds == 0) & (y == 1)).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    acc = (tp + tn) / max(len(y), 1)
    tpr = tp / max(tp + fn, 1)
    tnr = tn / max(tn + fp, 1)
    return {
        "accuracy": acc,
        "balanced_accuracy": 0.5 * (tpr + tnr),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "threshold": threshold,
        "confusion": {"tp": tp, "tn": tn, "fp": fp, "fn": fn},
    }


def roc_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based ROC AUC (Mann-Whitney U), ties averaged."""
    y = labels.astype(bool)
    n_pos, n_neg = int(y.sum()), int((~y).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(probs, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_p = probs[order]
    i = 0
    r = 1
    while i < len(sorted_p):
        j = i
        while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i : j + 1]] = avg
        r += j - i + 1
        i = j + 1
    return float((ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def evaluate_fraud(params, model, table, dataset: FraudDataset, config: RecformerConfig,
                   batch_size: int = 32,
                   thresholds: Sequence[float] = tuple(np.arange(0.1, 0.91, 0.1)),
                   scan_chunk: int = 32) -> Dict:
    """Threshold sweep maximizing F1 (``finetune_classification.py:140-208``)."""
    batches = list(dataset.batches(batch_size))
    if len(batches) > 1:
        # groups of scan_chunk batches per device call (relay dispatch
        # amortization + coarse progress; see evaluate_seqrec) — probs come
        # back as one (chunk, B) transfer per group; the scan wrapper is
        # memoized in steps.py
        run = make_fraud_eval_scan(config, model)
        all_probs, all_labels = [], []
        for group, pad in _scan_groups(batches, scan_chunk):
            probs2d = np.asarray(run(params, table,
                                     _stack_field(group, pad, "item_ids"),
                                     _stack_field(group, pad, "seq_lens")))
            all_probs.extend(p[b.valid] for p, b in zip(probs2d, group))
            all_labels.extend(b.labels[b.valid] for b in group)
        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels)
    else:
        step = make_fraud_eval_step(config, model)
        all_probs, all_labels = [], []
        for batch in batches:
            probs = step(params, table, jnp.asarray(batch.item_ids), jnp.asarray(batch.seq_lens))
            probs = np.asarray(probs)[batch.valid]
            all_probs.append(probs)
            all_labels.append(batch.labels[batch.valid])
        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels)
    best = None
    for t in thresholds:
        m = binary_classification_metrics(probs, labels, float(t))
        if best is None or m["f1"] > best["f1"]:
            best = m
    best["auc"] = roc_auc(probs, labels)
    return best
