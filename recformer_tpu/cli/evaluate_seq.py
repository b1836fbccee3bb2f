"""Evaluation-only driver: load a checkpoint, encode the catalog, run
full-corpus ranked eval on the test split.

TPU-native counterpart of ``/root/reference/evaluate_seq.py`` — also the
zero-shot cross-domain path (pretrained encoder + freshly encoded item text
of an unseen category).
"""

from __future__ import annotations

import argparse
import json
import os


from ..data.datasets import EvalDataset
from ..models.heads import RecformerForSeqRec
from ..training.loops import encode_all_items, evaluate_seqrec
from ..utils.io import load_finetune_artifacts
from .common import (
    build_config,
    init_model_params,
    make_tokenizer,
    maybe_load_pretrained,
    table_to_device,
    tokenize_corpus_cached,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--hf_tokenizer", type=str, default=None)
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--split", choices=["val", "test"], default="test")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--encode_batch_size", type=int, default=256)
    p.add_argument("--temp", type=float, default=0.05)
    p.add_argument("--attention_impl", choices=["dense", "chunked", "pallas"], default=None)
    p.add_argument("--hidden_act", choices=["gelu", "gelu_tanh", "relu"], default=None,
                   help="override activation: 'gelu' (exact erf) restores HF parity "
                        "for imported checkpoints; base() defaults to gelu_tanh")
    p.add_argument("--scan_layers", action="store_true", default=None,
                   help="stacked lax.scan encoder layers (faster compiles)")
    p.add_argument("--remat", action="store_true", default=None)
    p.add_argument("--remat_policy", default=None,
                   choices=["full", "save_attention", "dots", "dots_attn"])
    p.add_argument("--pooler_type", choices=["cls", "avg"], default=None,
                   help="sequence pooling: CLS token (default) or masked mean")
    p.add_argument("--max_token_num", type=int, default=None,
                   help="max sequence length in tokens (reference README: 512/256 "
                        "trade little accuracy for speed vs the 1024 default)")
    p.add_argument("--scan_unroll", type=int, default=None,
                   help="layers per lax.scan iteration (cross-layer fusion vs program size)")
    p.add_argument("--item_embeddings", type=str, default=None,
                   help="precomputed catalog .npy saved by cli.finetune — "
                        "REQUIRED to reproduce a two-stage finetune's test "
                        "metric (the catalog is part of the checkpoint; a "
                        "fresh encode is the zero-shot protocol instead)")
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--sharded_eval", type=int, default=0, metavar="N_SHARDS",
                   help="rank with the item catalog row-sharded over N "
                        "devices ('model' mesh axis) via explicit shard_map "
                        "collectives (parallel/catalog.py) instead of the "
                        "default single-table GSPMD path — the (B, N) score "
                        "matrix is never materialized on one device "
                        "(reference keeps both on ONE GPU, models.py:539-545)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    train, val, test, meta, item2id, id2item = load_finetune_artifacts(args.data_path)
    config = build_config(args, item_num=len(item2id))
    tokenizer = make_tokenizer(config, args.hf_tokenizer)
    name = os.path.basename(os.path.normpath(args.data_path))
    table_np = tokenize_corpus_cached(
        tokenizer, meta, item2id, os.path.join(args.data_path, "preprocess"), name
    )
    table = table_to_device(table_np)

    model = RecformerForSeqRec(config)
    params = init_model_params(model, config)
    params = maybe_load_pretrained(params, args.ckpt)

    if args.item_embeddings:
        import jax.numpy as jnp
        import numpy as np

        # the catalog saved with the finetuned checkpoint (see cli.finetune):
        # reproduces the two-stage test metric exactly
        item_embeddings = jnp.asarray(np.load(args.item_embeddings))
    else:
        # zero-shot protocol: fresh encode, disk-cached (reference
        # finetune.py:277-285), keyed by a params fingerprint
        item_embeddings = encode_all_items(
            params, model, table, config, args.encode_batch_size,
            cache_path=os.path.join(args.data_path, "preprocess",
                                    f"item_emb_{name}.npz"))
    max_items = max(max((len(s) for s in train.values()), default=1), 1) + 1
    ds = EvalDataset(train, val, test, args.split, max_items=max_items)
    if args.sharded_eval:
        import jax

        from ..parallel.mesh import make_mesh
        from ..training.loops import evaluate_seqrec_sharded

        n_model = args.sharded_eval
        n_dev = len(jax.devices())
        if n_dev % n_model:
            raise SystemExit(f"--sharded_eval {n_model} does not divide the "
                             f"{n_dev} available devices")
        mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)
        metrics = evaluate_seqrec_sharded(params, model, table, ds,
                                          item_embeddings, config, mesh,
                                          args.batch_size)
    else:
        metrics = evaluate_seqrec(params, model, table, ds, item_embeddings,
                                  config, args.batch_size, log=print)
    print(f"{args.split} set: {metrics}")
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    main()
