"""Learnability-parity harness: the repo's JAX finetune path vs the ACTUAL
HF torch Longformer, trained on identical data from identical weights.

This is part 2 of the documented no-egress fallback for the north-star
accuracy protocol (VERDICT round-1 item 1; the recorded download failure is
``docs/artifacts/download_attempt_round2.txt``): with the real Amazon dumps
and the ``allenai/longformer-base-4096`` checkpoint unreachable, the
strongest available accuracy-parity evidence is that this framework's model
LEARNS the task exactly like the reference's architecture does, when every
other variable is pinned:

1. generate the structured synthetic benchmark (``pipelines/synthetic.py``)
2. build a torch Recformer — a fresh implementation of the reference's
   architectural contract (``/root/reference/recformer/models.py:57-120``:
   4-way embedding sum -> HF ``LongformerEncoder`` -> CLS pooler ->
   cosine/temp full-softmax CE) on the REAL ``transformers`` encoder
3. import its init into the JAX model through the production torch importer
   (``training/checkpoint.import_torch_state_dict``) -> bit-identical start
4. train both on identical batches — the JAX device pipeline's assembled
   arrays feed torch — with identical AdamW(+clip 1.0), dropout 0, fp32
5. leave-one-out full-catalog NDCG@10 / Recall@10 both sides, plus the
   popularity floor both must clear

Run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/learnability_parity.py
Writes ``docs/artifacts/learnability_parity.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

def build_torch_model(cfg):
    """Reference-contract Recformer on the real HF LongformerEncoder.

    Module names follow the reference checkpoint layout
    (``longformer.embeddings.*`` / ``longformer.encoder.layer.N.*``) so the
    production importer maps every tensor."""
    import torch
    from torch import nn
    from transformers.models.longformer.modeling_longformer import (
        LongformerConfig,
        LongformerEncoder,
    )

    hf_cfg = LongformerConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        attention_window=list(cfg.attention_window),
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps,
    )

    class TorchRecformer(nn.Module):
        def __init__(self):
            super().__init__()
            H = cfg.hidden_size
            emb = nn.Module()
            emb.word_embeddings = nn.Embedding(cfg.vocab_size, H,
                                               padding_idx=cfg.pad_token_id)
            emb.position_embeddings = nn.Embedding(cfg.max_position_embeddings, H)
            emb.token_type_embeddings = nn.Embedding(cfg.token_type_size, H)
            emb.item_position_embeddings = nn.Embedding(cfg.max_item_embeddings, H)
            emb.LayerNorm = nn.LayerNorm(H, eps=cfg.layer_norm_eps)
            self.longformer = nn.Module()
            self.longformer.embeddings = emb
            self.longformer.encoder = LongformerEncoder(hf_cfg)
            for m in self.modules():
                if isinstance(m, nn.Embedding):
                    nn.init.normal_(m.weight, std=cfg.initializer_range)

        def forward(self, batch):
            ids = batch["input_ids"]
            attn = batch["attention_mask"]
            glob = batch["global_attention_mask"]
            # padding-aware position ids (models/embeddings.py semantics)
            pos = torch.cumsum(attn, dim=1) * attn + cfg.pad_token_id
            e = self.longformer.embeddings
            x = (e.word_embeddings(ids) + e.position_embeddings(pos)
                 + e.token_type_embeddings(batch["token_type_ids"])
                 + e.item_position_embeddings(batch["item_position_ids"]))
            x = e.LayerNorm(x)
            merged = attn * (glob + 1)  # {0 pad, 1 local, 2 global}
            mask_f = (1.0 - merged.float()) * torch.finfo(torch.float32).min
            out = self.longformer.encoder(
                x, attention_mask=mask_f, head_mask=None, padding_len=0,
                output_attentions=False, output_hidden_states=False,
                return_dict=True,
            ).last_hidden_state
            return out[:, 0]  # CLS pooler

    return TorchRecformer()


def torch_batch(np_batch):
    import torch

    return {k: torch.from_numpy(np.asarray(v).astype(np.int64))
            for k, v in np_batch.items()}


def torch_encode_items(model, table, cfg, batch_size=64):
    import torch

    from recformer_tpu.data.device_pipeline import assemble_for_config

    n = int(table["lengths"].shape[0]) - 1
    pad_to = ((n + batch_size - 1) // batch_size) * batch_size
    ids = np.arange(pad_to, dtype=np.int32)
    ids[n:] = 0
    outs = []
    with torch.no_grad():
        for c in range(0, pad_to, batch_size):
            chunk = jnp.asarray(ids[c: c + batch_size])
            b = assemble_for_config(table, chunk[:, None],
                                    jnp.ones_like(chunk), cfg,
                                    out_len=cfg.item_seq_len)
            outs.append(model(torch_batch({k: np.asarray(v)
                                           for k, v in b.items()})).numpy())
    return np.concatenate(outs, 0)[:n]


def cosine_scores(pooled: np.ndarray, emb: np.ndarray, temp: float):
    p = pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)
    e = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
    return (p @ e.T) / temp


def rank_metrics(scores: np.ndarray, labels: np.ndarray, ks=(10, 50)):
    """Exact label rank -> NDCG@k / Recall@k / MRR (reference utils.py:96-107
    semantics)."""
    label_score = scores[np.arange(len(labels)), labels]
    rank = (scores > label_score[:, None]).sum(-1)
    out = {}
    for k in ks:
        hit = rank < k
        out[f"NDCG@{k}"] = float(np.mean(np.where(hit, 1.0 / np.log2(rank + 2), 0.0)))
        out[f"Recall@{k}"] = float(np.mean(hit))
    out["MRR"] = float(np.mean(1.0 / (rank + 1)))
    return out


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--workdir", default="/tmp/learnability_parity")
    ap.add_argument("--out", default="docs/artifacts/learnability_parity.json")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jax_hidden_act", default="gelu",
                    choices=["gelu", "gelu_tanh"],
                    help="JAX-side activation; torch side always runs the "
                         "reference's exact-erf gelu. 'gelu_tanh' turns this "
                         "harness into the accuracy-neutrality check for the "
                         "production tanh-GELU default (docs/PERF.md)")
    args = ap.parse_args(argv)

    import optax
    import torch

    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.datasets import EvalDataset, SequenceDataset
    from recformer_tpu.data.device_pipeline import (assemble_for_config,
                                                    make_finetune_batch)
    from recformer_tpu.models.heads import RecformerForSeqRec
    from recformer_tpu.pipelines.synthetic import (generate_benchmark,
                                                   popularity_baseline)
    from recformer_tpu.training.checkpoint import import_torch_state_dict
    from recformer_tpu.training.loops import encode_all_items, evaluate_seqrec
    from recformer_tpu.training.steps import TrainState, make_finetune_step
    from recformer_tpu.utils.io import load_finetune_artifacts
    from recformer_tpu.cli.common import (make_tokenizer, table_to_device,
                                           tokenize_corpus_cached)

    t0 = time.time()
    torch.manual_seed(args.seed)

    # 1. data ---------------------------------------------------------------
    if not os.path.exists(os.path.join(args.workdir, "finetune", "train.json")):
        generate_benchmark(args.workdir, n_items=120, n_users=400,
                           n_categories=8, n_brands=16, pretrain_items=150,
                           pretrain_users=100, seed=args.seed + 7)
    ft_dir = os.path.join(args.workdir, "finetune")
    train, val, test, meta, item2id, id2item = load_finetune_artifacts(ft_dir)
    n_items = len(item2id)
    pop = popularity_baseline(train, test, n_items)
    print(f"[parity] items={n_items} users={len(train)} "
          f"popularity floor: {pop}")

    cfg = RecformerConfig.tiny(
        dtype="float32", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attention_impl="chunked",
        hidden_act=args.jax_hidden_act, item_num=n_items,
        finetune_negative_sample_size=0, max_token_num=128,
        max_item_embeddings=51, item_seq_len=32, temp=0.05)
    tokenizer = make_tokenizer(cfg)
    table_np = tokenize_corpus_cached(tokenizer, meta, item2id,
                                      os.path.join(ft_dir, "preprocess"),
                                      "parity")
    table = table_to_device(table_np)

    # 2. identical weights ----------------------------------------------------
    tmodel = build_torch_model(cfg)
    jmodel = RecformerForSeqRec(cfg)
    dummy = {k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
             for k in ("input_ids", "attention_mask", "global_attention_mask",
                       "token_type_ids", "item_position_ids")}
    params = jmodel.init(jax.random.PRNGKey(0), dummy)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, copied, skipped = import_torch_state_dict(sd, params, verbose=False)
    real_skipped = [s for s in skipped if "position_ids" not in s]
    assert not real_skipped, f"importer missed: {real_skipped}"
    print(f"[parity] imported {len(copied)} tensors from torch init")

    # 3. identical training ---------------------------------------------------
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(args.lr, weight_decay=0.0))
    state = TrainState.create(apply_fn=jmodel.apply, params=params, tx=tx)
    jstep = make_finetune_step(cfg, jmodel)
    topt = torch.optim.AdamW(tmodel.parameters(), lr=args.lr, weight_decay=0.0)

    max_items = max(len(s) for s in train.values())
    ds = SequenceDataset(train, max_items=max_items)
    rng0 = jax.random.PRNGKey(args.seed + 1)
    results = {"popularity": pop, "epochs": []}
    gstep = 0
    for epoch in range(args.epochs):
        # frozen per-epoch catalogs (reference stage-1 semantics)
        jemb = encode_all_items(state.params, jmodel, table, cfg, batch_size=64)
        temb = torch_encode_items(tmodel, table, cfg)
        if epoch == 0:
            tol = 2e-3 if args.jax_hidden_act == "gelu" else 2e-2
            np.testing.assert_allclose(np.asarray(jemb), temb, rtol=tol,
                                       atol=tol)
            print("[parity] epoch-0 item embeddings match (identical init)")
        jl_sum = tl_sum = 0.0
        nb = 0
        for batch in ds.batches(args.batch_size, shuffle=True, seed=epoch,
                                drop_last=True):
            ids = jnp.asarray(batch.item_ids)
            lens = jnp.asarray(batch.seq_lens)
            # --- JAX: the repo's production finetune step
            state, m = jstep(state, rng0, table, ids, lens, jemb)
            jl_sum += float(m["loss"]); nb += 1
            # --- torch: IDENTICAL batch, replicated from the step's own rng
            # derivation (steps.make_finetune_step: fold_in(rng, step) ->
            # split 3 -> target rng)
            key = jax.random.fold_in(rng0, gstep)
            rng_target, _, _ = jax.random.split(key, 3)
            jb, jlabels = make_finetune_batch(rng_target, table, ids, lens, cfg)
            tb = torch_batch({k: np.asarray(v) for k, v in jb.items()})
            labels_t = torch.from_numpy(np.asarray(jlabels).astype(np.int64))
            pooled = tmodel(tb)
            emb_t = torch.from_numpy(temb)
            p = torch.nn.functional.normalize(pooled, dim=-1)
            e = torch.nn.functional.normalize(emb_t, dim=-1)
            logits = (p @ e.T) / cfg.temp
            loss = torch.nn.functional.cross_entropy(logits, labels_t)
            topt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
            topt.step()
            tl_sum += float(loss.detach()); gstep += 1
        print(f"[parity] epoch {epoch}: jax loss {jl_sum/nb:.4f} "
              f"torch loss {tl_sum/nb:.4f}")
        results["epochs"].append({"epoch": epoch, "jax_loss": jl_sum / nb,
                                  "torch_loss": tl_sum / nb})

    # 4. identical eval --------------------------------------------------------
    jemb = encode_all_items(state.params, jmodel, table, cfg, batch_size=64)
    temb = torch_encode_items(tmodel, table, cfg)
    eval_ds = EvalDataset(train, val, test, "test", max_items=max_items + 2)
    jmetrics = evaluate_seqrec(state.params, jmodel, table, eval_ds, jemb,
                               cfg, batch_size=32)
    # torch: the same EvalDataset batches through the torch model
    pooled_all, labels_all = [], []
    import torch as _t
    with _t.no_grad():
        for batch in eval_ds.batches(32):
            b = assemble_for_config(table, jnp.asarray(batch.item_ids),
                                    jnp.asarray(batch.seq_lens), cfg)
            p = tmodel(torch_batch({k: np.asarray(v) for k, v in b.items()}))
            pooled_all.append(p.numpy()[batch.valid])
            labels_all.append(np.asarray(batch.labels)[batch.valid])
    tmetrics = rank_metrics(
        cosine_scores(np.concatenate(pooled_all), temb, cfg.temp),
        np.concatenate(labels_all))

    results["jax"] = {k: float(v) for k, v in jmetrics.items()}
    results["torch"] = tmetrics
    results["wall_s"] = time.time() - t0
    print(f"[parity] JAX  : {results['jax']}")
    print(f"[parity] torch: {results['torch']}")
    results["jax_hidden_act"] = args.jax_hidden_act
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    # the parity claims
    j, t = results["jax"]["NDCG@10"], tmetrics["NDCG@10"]
    floor = pop["NDCG@10"]
    assert j > 1.5 * floor, f"JAX model failed to learn: {j} vs floor {floor}"
    assert t > 1.5 * floor, f"torch model failed to learn: {t} vs floor {floor}"
    assert abs(j - t) < 0.25 * max(j, t) + 0.02, \
        f"learnability gap: jax {j} vs torch {t}"
    print(f"[parity] PASS: NDCG@10 jax {j:.4f} ~ torch {t:.4f} "
          f"(floor {floor:.4f})")
    return results


if __name__ == "__main__":
    main()
