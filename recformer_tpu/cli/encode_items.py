"""Item-embedding encoding service driver: batch-encode a whole catalog with
a trained encoder and save the ``(N, H)`` matrix.

Counterpart of the reference's ``encode_all_items`` fan-out (which used
``nn.DataParallel`` + OOM-retry chunking,
``/root/reference/finetune_classification.py:67-137``); here the batch axis is
sharded over all chips by GSPMD and shapes are static, so there is no OOM
retry loop to need.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..models.heads import RecformerForSeqRec
from ..training.loops import encode_all_items
from ..utils.io import read_json
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
    p.add_argument("--meta_file", type=str, default="meta_data.json")
    p.add_argument("--item2id_file", type=str, default="smap.json")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--hf_tokenizer", type=str, default=None)
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--output", type=str, default="item_embeddings.npy")
    p.add_argument("--attention_impl", choices=["dense", "chunked", "pallas"], default=None)
    p.add_argument("--hidden_act", choices=["gelu", "gelu_tanh", "relu"], default=None,
                   help="override activation: 'gelu' (exact erf) restores HF parity "
                        "for imported checkpoints; base() defaults to gelu_tanh")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    meta = read_json(os.path.join(args.data_path, args.meta_file))
    item2id = read_json(os.path.join(args.data_path, args.item2id_file))
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
    emb = encode_all_items(params, model, table, config, args.batch_size)
    np.save(args.output, np.asarray(emb))
    print(f"[encode] wrote {emb.shape} embeddings to {args.output}")


if __name__ == "__main__":
    main()
