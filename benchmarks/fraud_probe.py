"""Linear probe on the encoder's POOLED features for the fraud track.

Companion diagnostic to ``benchmarks/fraud_oracle.py``: the oracle proves the
planted signal is learnable from the bag of tokens (small-corpus test AUC
0.84, paper 0.949), yet the transformer + MLP head stays degenerate even with
the discriminative head LR. This probe separates the two remaining suspects:

- if a logistic regression on the *pooled encoder output* recovers the
  oracle's AUC, the features carry the signal and the failure is the MLP-head
  optimization;
- if the probe is at chance while the oracle is not, the pooled
  representation itself buries the signal (random-init transformer pooling
  collapse / token dilution) and no head recipe can fix it — the fix must
  change what feeds the head (pretrained init, pooling, or feature path).

Mirrors the reference's debugging role for ``finetune_classification.py`` —
the reference never needs this because it always starts fraud runs from a
pretrained checkpoint (``/root/reference/finetune_classification.py:294-323``
loads ``--pretrain_ckpt``).

Usage:
    python benchmarks/fraud_probe.py --data <dir>/classification_data \
        [--model_size tiny] [--pooler cls|avg] [--pretrain_ckpt DIR] \
        [--out probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def pooled_features(params, model, table, dataset, config, batch_size=32):
    """Deterministic pooled backbone output for every valid card."""
    from recformer_tpu.data.device_pipeline import assemble_for_config
    from recformer_tpu.models.recformer import RecformerModel

    backbone = RecformerModel(config)
    bb_params = {"params": params["params"]["longformer"]}

    @jax.jit
    def step(p, table, item_ids, seq_lens):
        batch = assemble_for_config(table, item_ids, seq_lens, config)
        _, pooled = backbone.apply(
            p,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            global_attention_mask=batch["global_attention_mask"],
            token_type_ids=batch["token_type_ids"],
            item_position_ids=batch["item_position_ids"],
            deterministic=True,
        )
        return pooled.astype(jnp.float32)

    feats, labels = [], []
    for b in dataset.batches(batch_size):
        pooled = np.asarray(step(bb_params, table, jnp.asarray(b.item_ids),
                                 jnp.asarray(b.seq_lens)))
        feats.append(pooled[b.valid])
        labels.append(b.labels[b.valid])
    return np.concatenate(feats), np.concatenate(labels).astype(np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--model_size", choices=["base", "tiny"], default="tiny")
    ap.add_argument("--pooler", choices=["cls", "avg"], default="cls")
    ap.add_argument("--pretrain_ckpt", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score, roc_auc_score

    from recformer_tpu.cli.common import (
        build_config, init_model_params, make_tokenizer,
        maybe_load_pretrained, table_to_device, tokenize_corpus_cached)
    from recformer_tpu.data.datasets import FraudDataset
    from recformer_tpu.models.heads import RecformerForFraudDetection
    from recformer_tpu.utils.io import read_json

    splits = {name: read_json(os.path.join(args.data, f"{name}.json"), as_int=True)
              for name in ("train", "val", "test")}
    meta = read_json(os.path.join(args.data, "meta_data.json"))
    item2id = read_json(os.path.join(args.data, "smap.json"))
    max_items = max(len(v[0]) for v in splits["train"].values())
    datasets = {k: FraudDataset(v, max_items=max_items) for k, v in splits.items()}

    class _A:  # minimal arg shim for build_config
        model_size = args.model_size
        attention_impl = None
        hidden_act = None
        scan_layers = None
        remat = None
        remat_policy = None
        pooler_type = args.pooler
        max_token_num = None
        scan_unroll = None

    config = build_config(_A(), item_num=len(item2id))
    tokenizer = make_tokenizer(config, None)
    table_np = tokenize_corpus_cached(
        tokenizer, meta, item2id, os.path.join(args.data, "preprocess"),
        os.path.basename(os.path.normpath(args.data)))
    table = table_to_device(table_np)

    model = RecformerForFraudDetection(config)
    params = init_model_params(model, config)
    params = maybe_load_pretrained(params, args.pretrain_ckpt)

    feats = {k: pooled_features(params, model, table, ds, config)
             for k, ds in datasets.items()}
    Xtr, ytr = feats["train"]
    # standardize (probe hygiene: pooled scales vary across dims)
    mu, sd = Xtr.mean(0), Xtr.std(0) + 1e-6
    clf = LogisticRegression(max_iter=2000, class_weight="balanced")
    clf.fit((Xtr - mu) / sd, ytr)

    out = {"model_size": args.model_size, "pooler": args.pooler,
           "pretrain_ckpt": args.pretrain_ckpt, "feature_dim": int(Xtr.shape[1])}
    for split in ("train", "val", "test"):
        X, y = feats[split]
        p = clf.predict_proba((X - mu) / sd)[:, 1]
        out[split] = {
            "auc": float(roc_auc_score(y, p)) if 0 < y.sum() < len(y) else None,
            "f1": float(f1_score(y, p > 0.5, zero_division=0)),
            "pos": int(y.sum()), "n": int(len(y)),
        }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
