"""Jitted train / eval / encode steps for all three tasks.

These replace the reference's Lightning + hand-written torch loops
(``/root/reference/recformer/litmodels.py``, ``finetune.py:66-137``,
``finetune_classification.py:140-258``) with pure functions compiled once.
Data construction (sequence assembly, target sampling, MLM masking) happens
*inside* the step on device — the host only feeds item-id arrays.

Under a ``jax.sharding.Mesh`` the same step functions run data-parallel: batch
inputs are sharded along the ``data`` axis and XLA inserts the cross-device
collectives (notably the all-gather behind the global in-batch contrastive
similarity, replacing the reference's manual ``torch.distributed.all_gather``
at ``models.py:475-490``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax.training import train_state

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RecformerConfig
from ..data.device_pipeline import (
    assemble_for_config,
    make_finetune_batch,
    make_pretrain_batch,
)
from ..models.heads import similarity_scores
from . import losses
from .metrics import rank_from_scores


class TrainState(train_state.TrainState):
    pass


def _shardings(mesh: Optional[Mesh]):
    """(replicated, batch-sharded, catalog-row-sharded) NamedShardings, or
    Nones when no mesh is given (single device)."""
    if mesh is None:
        return None, None, None
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS)) if DATA_AXIS in mesh.shape else rep
    catalog = (NamedSharding(mesh, P(MODEL_AXIS))
               if MODEL_AXIS in mesh.shape else rep)
    return rep, data, catalog


def _jit(fn, mesh, in_shardings=None, out_shardings=None):
    if mesh is None:
        return jax.jit(fn)
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)



# ---------------------------------------------------------------------------
# Pretraining
# ---------------------------------------------------------------------------

def make_pretrain_step(config: RecformerConfig, model, axis_name: Optional[str] = None,
                       mesh: Optional[Mesh] = None, zero: bool = False):
    """Returns step(state, rng, table, item_ids, seq_lens) -> (state, metrics).

    One step = device-side pair sampling + MLM, 4 encoder passes (two views +
    two MLM towers, fused pairwise), InfoNCE over the (global) batch +
    mlm_weight * MLM CE — reference ``models.py:382-520`` +
    ``collator.py:17-52``.

    ``zero=True`` leaves the train-state shardings unspecified so a state
    prepared with ``parallel.mesh.shard_optimizer_state`` keeps its ZeRO-style
    sharded optimizer leaves (GSPMD gathers/scatters around the update).
    """

    def loss_fn(params, rng, batch_a, batch_b):
        out = model.apply(params, batch_a, batch_b, deterministic=False,
                          rngs={"dropout": rng})
        cl_loss, correct, total = losses.info_nce_loss(
            out.z1, out.z2, config.temp, axis_name=axis_name,
            grad_mode=config.contrastive_gradient,
        )
        loss = cl_loss
        metrics = {"cl_loss": cl_loss, "cl_correct": correct, "cl_total": total}
        if out.mlm_logits_a is not None:
            mlm_a = losses.mlm_loss(out.mlm_logits_a, batch_a["mlm_labels"])
            loss = loss + config.mlm_weight * mlm_a
            metrics["mlm_loss_a"] = mlm_a
        if out.mlm_logits_b is not None:
            mlm_b = losses.mlm_loss(out.mlm_logits_b, batch_b["mlm_labels"])
            loss = loss + config.mlm_weight * mlm_b
            metrics["mlm_loss_b"] = mlm_b
        metrics["loss"] = loss
        metrics["accuracy"] = correct / jnp.maximum(total, 1e-5)
        return loss, metrics

    def step(state: TrainState, rng, table, item_ids, seq_lens):
        rng_data, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        batch_a, batch_b = make_pretrain_batch(rng_data, table, item_ids, seq_lens, config)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng_drop, batch_a, batch_b
        )
        return state.apply_gradients(grads=grads), metrics

    if mesh is not None and config.contrastive_gradient == "local":
        return _local_grad_pretrain_step(config, model, mesh)

    rep, data, _ = _shardings(mesh)
    state_sh = None if zero else rep  # None => keep the input's committed sharding
    return _jit(step, mesh,
                in_shardings=(state_sh, rep, rep, data, data),
                out_shardings=(state_sh, rep))


def _local_grad_pretrain_step(config: RecformerConfig, model, mesh: Mesh):
    """Reference-parity contrastive gradients: the all-gathered remote
    embeddings are stop-gradded and only the local shard's rows carry grads
    (``models.py:475-490``), with DDP-style gradient averaging (pmean). Built
    on shard_map so the gather/psum pattern is explicit."""
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    axis = DATA_AXIS

    def loss_fn(params, rng, batch_a, batch_b):
        out = model.apply(params, batch_a, batch_b, deterministic=False,
                          rngs={"dropout": rng})
        cl_loss, correct, total = losses.info_nce_loss(
            out.z1, out.z2, config.temp, axis_name=axis, grad_mode="local"
        )
        loss = cl_loss
        if out.mlm_logits_a is not None:
            loss = loss + config.mlm_weight * losses.mlm_loss(
                out.mlm_logits_a, batch_a["mlm_labels"])
        if out.mlm_logits_b is not None:
            loss = loss + config.mlm_weight * losses.mlm_loss(
                out.mlm_logits_b, batch_b["mlm_labels"])
        # the similarity matrix is over the GATHERED batch, so correct/total
        # are already global and identical on every shard — no psum
        return loss, {"loss": loss, "cl_loss": cl_loss, "cl_correct": correct,
                      "cl_total": total,
                      "accuracy": correct / jnp.maximum(total, 1e-5)}

    def shard_fn(params, rng, step_idx, table, item_ids, seq_lens):
        rng = jax.random.fold_in(rng, step_idx)
        # distinct data RNG per shard (hosts sample independent pairs/masks)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng_data, rng_drop = jax.random.split(rng)
        batch_a, batch_b = make_pretrain_batch(rng_data, table, item_ids, seq_lens, config)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng_drop, batch_a, batch_b
        )
        grads = jax.lax.pmean(grads, axis)  # DDP-average
        metrics = {k: jax.lax.pmean(v, axis) if k not in ("cl_correct", "cl_total")
                   else v for k, v in metrics.items()}
        return grads, metrics

    P_ = P
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_(), P_(DATA_AXIS), P_(DATA_AXIS)),
        out_specs=(P_(), P_()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, rng, table, item_ids, seq_lens):
        grads, metrics = sharded(state.params, rng, state.step, table,
                                 item_ids, seq_lens)
        return state.apply_gradients(grads=grads), metrics

    return step


def make_multi_step(step_fn, n_steps: int, scan_extras: int = 0):
    """Wrap a train step into a device-side ``lax.scan`` over ``n_steps``
    pre-staged batches: step(state, rng, table, stacked_item_ids (n, B, S),
    stacked_seq_lens (n, B), *extras) -> (state, metrics dict of (n,) traces).

    The first ``scan_extras`` extra args are per-step stacks (leading (n,)
    axis, scanned alongside ids/lens — e.g. fraud labels/valid); the rest are
    broadcast whole into every step (e.g. the item-embedding catalog).

    The FULL per-step metric dict comes out of the scan (every step's loss /
    accuracy / counters, not just the last), so drivers log real values.

    Amortizes host->device dispatch (one launch per n steps) — the TPU-native
    replacement for the reference's per-batch Python training loop. The input
    state is donated (callers always rebind), halving peak state memory."""

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state, rng, table, item_ids_stack, seq_lens_stack, *extras):
        scanned = extras[:scan_extras]
        bcast = extras[scan_extras:]

        def body(s, xs):
            ids, lens = xs[0], xs[1]
            s, m = step_fn(s, rng, table, ids, lens, *xs[2:], *bcast)
            return s, m

        return jax.lax.scan(body, state,
                            (item_ids_stack, seq_lens_stack, *scanned))

    return run


def make_pretrain_eval_step(config: RecformerConfig, model, mesh: Optional[Mesh] = None,
                            keep_param_sharding: bool = False):
    """Validation step: deterministic forward, contrastive accuracy + loss
    (reference ``litmodels.py:30-40``). ``keep_param_sharding=True`` leaves
    the params' committed placement alone (tensor-parallel shards)."""

    def step(params, rng, table, item_ids, seq_lens):
        batch_a, batch_b = make_pretrain_batch(rng, table, item_ids, seq_lens, config)
        out = model.apply(params, batch_a, batch_b, deterministic=True)
        cl_loss, correct, total = losses.info_nce_loss(out.z1, out.z2, config.temp)
        loss = cl_loss
        if out.mlm_logits_a is not None:
            loss = loss + config.mlm_weight * losses.mlm_loss(out.mlm_logits_a, batch_a["mlm_labels"])
        if out.mlm_logits_b is not None:
            loss = loss + config.mlm_weight * losses.mlm_loss(out.mlm_logits_b, batch_b["mlm_labels"])
        return {"val_loss": loss, "cl_correct": correct, "cl_total": total}

    rep, data, _ = _shardings(mesh)
    params_sh = None if keep_param_sharding else rep
    return _jit(step, mesh, in_shardings=(params_sh, rep, rep, data, data),
                out_shardings=rep)


# ---------------------------------------------------------------------------
# Sequential recommendation finetune / eval
# ---------------------------------------------------------------------------

def make_finetune_step(config: RecformerConfig, model, mesh: Optional[Mesh] = None):
    """step(state, rng, table, item_ids, seq_lens, item_embeddings) ->
    (state, metrics). Sampled softmax when
    ``finetune_negative_sample_size > 0`` else full softmax
    (``models.py:587-597``). ``item_embeddings`` is the frozen catalog."""

    def loss_fn(params, rng_drop, rng_neg, batch, labels, item_embeddings):
        pooled = model.apply(params, batch, deterministic=False, rngs={"dropout": rng_drop})
        if config.finetune_negative_sample_size > 0:
            loss = losses.seqrec_sampled_softmax_loss(
                pooled, item_embeddings, labels, config.temp,
                config.finetune_negative_sample_size, rng_neg,
            )
        else:
            loss = losses.seqrec_full_softmax_loss(pooled, item_embeddings, labels, config.temp)
        return loss

    def step(state: TrainState, rng, table, item_ids, seq_lens, item_embeddings):
        rng = jax.random.fold_in(rng, state.step)
        rng_target, rng_drop, rng_neg = jax.random.split(rng, 3)
        batch, labels = make_finetune_batch(rng_target, table, item_ids, seq_lens, config)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, rng_drop, rng_neg, batch, labels, item_embeddings
        )
        return state.apply_gradients(grads=grads), {"loss": loss}

    rep, data, catalog = _shardings(mesh)
    return _jit(step, mesh,
                in_shardings=(rep, rep, rep, data, data, catalog),
                out_shardings=(rep, rep))


def make_eval_step(config: RecformerConfig, model, ks: Sequence[int] = (10, 50),
                   mesh: Optional[Mesh] = None):
    """Full-catalog ranked eval (``finetune.py:66-96``): encode the history,
    score against every item, rank the label. Returns per-metric *sums* over
    valid rows plus the valid count, for exact streaming aggregation."""

    ks = tuple(ks)

    def step(params, table, item_ids, seq_lens, labels, valid, item_embeddings):
        batch = assemble_for_config(table, item_ids, seq_lens, config)
        pooled = model.apply(params, batch, deterministic=True)
        scores = similarity_scores(
            pooled.astype(jnp.float32), item_embeddings.astype(jnp.float32), config.temp
        )
        w = valid.astype(jnp.float32)
        out = {}
        rank = rank_from_scores(scores, labels)
        valid_length = jnp.sum((scores > -1e4).astype(jnp.float32), axis=-1)
        for k in ks:
            ind = (rank < k).astype(jnp.float32)
            out[f"NDCG@{k}"] = jnp.sum(w * ind / jnp.log2(rank + 2.0))
            out[f"Recall@{k}"] = jnp.sum(w * ind)
        out["MRR"] = jnp.sum(w / (rank + 1.0))
        out["AUC"] = jnp.sum(w * (1.0 - rank / jnp.maximum(valid_length, 1.0)))
        out["count"] = jnp.sum(w)
        return out

    rep, data, catalog = _shardings(mesh)
    return _jit(step, mesh,
                in_shardings=(rep, rep, data, data, data, data, catalog),
                out_shardings=rep)


# ---------------------------------------------------------------------------
# Item encoding service
# ---------------------------------------------------------------------------

def make_encode_items_step(config: RecformerConfig, model,
                           backbone_method: Optional[Callable] = None,
                           mesh: Optional[Mesh] = None):
    """Encode a chunk of items as single-item sequences at the short static
    ``item_seq_len`` (reference ``finetune.py:38-63`` pads to dynamic length).
    ``model`` must expose the pooled output for a plain batch (RecformerForSeqRec
    / the pretraining model's ``encode`` method)."""

    def step(params, table, item_id_chunk):
        # (C,) item ids -> (C, 1) one-item sequences
        ids = item_id_chunk[:, None]
        lens = jnp.ones_like(item_id_chunk)
        batch = assemble_for_config(table, ids, lens, config, out_len=config.item_seq_len)
        pooled = model.apply(params, batch, deterministic=True, method=backbone_method)
        return pooled

    rep, data, _ = _shardings(mesh)
    return _jit(step, mesh, in_shardings=(rep, rep, data), out_shardings=data)


# Jitted scan wrappers are memoized per (factory, model, config, extras):
# the eval/encode entry points in loops.py are called once per epoch, and
# rebuilding the wrapper each call re-traced the full scanned model host-side
# every time (advisor r2 — the persistent compile cache hid the recompiles
# but not the trace/lower cost). The model object is pinned inside the cache
# value so its id() cannot be recycled onto a different module.
_SCAN_CACHE: Dict[tuple, tuple] = {}


def _memo_scan(key, model, build):
    entry = _SCAN_CACHE.get(key)
    if entry is None:
        entry = (model, build())
        _SCAN_CACHE[key] = entry
    return entry[1]


def make_encode_items_scan(config: RecformerConfig, model,
                           backbone_method: Optional[Callable] = None):
    """Whole-catalog encode in ONE device call: ``lax.scan`` over ``(nb, C)``
    id chunks -> ``(nb, C, H)`` pooled embeddings. Math-identical to calling
    :func:`make_encode_items_step` per chunk, but pays host dispatch once per
    catalog instead of once per chunk (through the axon relay a dispatch costs
    ~1.8 s host-side; the reference's encode loop, ``finetune.py:38-63``, pays
    it per chunk). Peak memory is one chunk's activations + the stacked
    ``(nb, C, H)`` output."""

    def build():
        def chunk_fn(params, table, id_chunk):
            ids = id_chunk[:, None]
            lens = jnp.ones_like(id_chunk)
            batch = assemble_for_config(table, ids, lens, config,
                                        out_len=config.item_seq_len)
            return model.apply(params, batch, deterministic=True,
                               method=backbone_method)

        def step(params, table, ids2d):
            def body(carry, id_chunk):
                return carry, chunk_fn(params, table, id_chunk)

            _, out = jax.lax.scan(body, None, ids2d)
            return out

        return jax.jit(step)

    return _memo_scan(("encode_scan", id(model), config, backbone_method),
                      model, build)


def make_eval_scan(config: RecformerConfig, model, ks: Sequence[int] = (10, 50)):
    """All eval batches of one group in ONE device call: ``lax.scan`` of
    :func:`make_eval_step` over stacked ``(nb, B, ...)`` batches, per-batch
    metric sums reduced on device. Memoized (see ``_SCAN_CACHE``)."""
    ks = tuple(ks)

    def build():
        step = make_eval_step(config, model, ks=ks)

        @jax.jit
        def run(params, table, ids, lens, labels, valid, item_embeddings):
            def body(carry, xs):
                return carry, step(params, table, *xs, item_embeddings)

            _, outs = jax.lax.scan(body, None, (ids, lens, labels, valid))
            return jax.tree.map(lambda a: jnp.sum(a, axis=0), outs)

        return run

    return _memo_scan(("eval_scan", id(model), config, ks), model, build)


def make_fraud_eval_scan(config: RecformerConfig, model):
    """Fraud sigmoid probabilities for a group of stacked batches in one
    device call -> ``(nb, B)``. Memoized (see ``_SCAN_CACHE``)."""

    def build():
        step = make_fraud_eval_step(config, model)

        @jax.jit
        def run(params, table, ids, lens):
            def body(carry, xs):
                return carry, step(params, table, *xs)

            _, out = jax.lax.scan(body, None, (ids, lens))
            return out

        return run

    return _memo_scan(("fraud_eval_scan", id(model), config), model, build)


# ---------------------------------------------------------------------------
# Fraud classification
# ---------------------------------------------------------------------------

def make_fraud_train_step(config: RecformerConfig, model, mesh: Optional[Mesh] = None):
    def loss_fn(params, rng_drop, batch, labels, valid):
        logits = model.apply(params, batch, deterministic=False, rngs={"dropout": rng_drop})
        x = logits.astype(jnp.float32)
        y = labels.astype(jnp.float32)
        per = config.pos_weight * y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
        w = valid.astype(jnp.float32)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

    def step(state: TrainState, rng, table, item_ids, seq_lens, labels, valid):
        rng_drop = jax.random.fold_in(rng, state.step)
        batch = assemble_for_config(table, item_ids, seq_lens, config)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng_drop, batch, labels, valid)
        return state.apply_gradients(grads=grads), {"loss": loss}

    rep, data, _ = _shardings(mesh)
    return _jit(step, mesh,
                in_shardings=(rep, rep, rep, data, data, data, data),
                out_shardings=(rep, rep))


def make_fraud_eval_step(config: RecformerConfig, model, mesh: Optional[Mesh] = None):
    def step(params, table, item_ids, seq_lens):
        batch = assemble_for_config(table, item_ids, seq_lens, config)
        logits = model.apply(params, batch, deterministic=True)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    rep, data, _ = _shardings(mesh)
    return _jit(step, mesh, in_shardings=(rep, rep, data, data), out_shardings=data)
