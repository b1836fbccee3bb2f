"""Learnability oracle for the planted fraud signal (round-3 VERDICT item 2).

Before debiting the *model* for a degenerate fraud result, prove the corpus
itself carries a learnable per-card signal **through the exact data view the
model gets**: each card's transaction sequence is reduced to the bag of text
tokens the framework tokenizer produces for it (same attr truncation —
``max_attr_num=3`` keeps {amount, merchant, year} — same newest-first
``max_item_embeddings - 1`` sequence truncation as
``data/tokenization.py::encode``), and a logistic regression is trained on
the classification split's train cards and scored on val/test.

If this oracle cannot beat AUC 0.8, the generator/pipeline is at fault
(fix it, not the model); if it can, a transformer that fails has a training
problem. Mirrors the role of the reference's manual sanity eval
(``/root/reference/finetune_classification.py:140-208``).

Usage:
    python benchmarks/fraud_oracle.py --data runs/txn/artifacts/classification_data \
        [--out docs/artifacts/fraud_oracle.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import backend_for_config
from recformer_tpu.utils.io import read_json


def featurize(split, meta, item2id, tokenizer, config, dim_map):
    """Bag-of-token-id features per card, through the model's own item view."""
    id2meta = {v: k for k, v in item2id.items()}
    rows, labels = [], []
    for _, (seq, label) in sorted(split.items()):
        # newest-first truncation to max_item_embeddings-1, as encode() does
        kept = list(reversed(seq))[: config.max_item_embeddings - 1]
        counts = {}
        for item in kept:
            ids, _types, _begin = tokenizer.encode_item(meta[id2meta[item]])
            for t in ids:
                counts[t] = counts.get(t, 0) + 1
        rows.append(counts)
        labels.append(int(label[0] if isinstance(label, list) else label))
    # stable feature indexing shared across splits
    for c in rows:
        for t in c:
            if t not in dim_map:
                dim_map[t] = len(dim_map)
    return rows, np.asarray(labels, np.int64)


def to_matrix(rows, dim_map):
    X = np.zeros((len(rows), len(dim_map)), np.float32)
    for i, counts in enumerate(rows):
        for t, c in counts.items():
            j = dim_map.get(t)
            if j is not None:
                X[i, j] = 1.0  # presence; burst tokens are near-unique anyway
    return X


def best_f1(y, p):
    from sklearn.metrics import f1_score

    best = (0.0, 0.5)
    for thr in np.arange(0.1, 0.91, 0.05):
        f = f1_score(y, (p >= thr).astype(int), zero_division=0)
        if f > best[0]:
            best = (float(f), float(thr))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="classification_data dir (train/val/test.json + meta)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    meta = read_json(os.path.join(args.data, "meta_data.json"))
    item2id = read_json(os.path.join(args.data, "smap.json"))
    config = RecformerConfig.base(item_num=len(item2id))
    tokenizer = RecformerTokenizer(config, backend_for_config(config))

    dim_map = {}
    splits = {}
    for name in ("train", "val", "test"):
        raw = read_json(os.path.join(args.data, f"{name}.json"), as_int=True)
        splits[name] = featurize(raw, meta, item2id, tokenizer, config, dim_map)

    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score

    Xtr = to_matrix(splits["train"][0], dim_map)
    ytr = splits["train"][1]
    clf = LogisticRegression(max_iter=2000, C=1.0, class_weight="balanced")
    clf.fit(Xtr, ytr)

    report = {"n_features": len(dim_map),
              "train_cards": int(len(ytr)), "train_pos": int(ytr.sum())}
    for name in ("train", "val", "test"):
        X = to_matrix(splits[name][0], dim_map)
        y = splits[name][1]
        p = clf.predict_proba(X)[:, 1]
        auc = float(roc_auc_score(y, p)) if 0 < y.sum() < len(y) else float("nan")
        f1, thr = best_f1(y, p)
        report[name] = {"auc": auc, "best_f1": f1, "f1_threshold": thr,
                        "pos": int(y.sum()), "n": int(len(y))}
    print(json.dumps(report, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
