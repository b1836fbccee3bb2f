"""Batch recommendation serving: user sequences in, top-k item ids out.

The serving-shaped path of the reference is ``RecformerForSeqRec`` inference
with ``labels=None`` -> full-catalog scores on one device
(``/root/reference/recformer/models.py:583-585``). Here the catalog is
row-sharded and top-k is computed with the explicit shard_map merge
(``parallel/catalog.py``) when more than one device is present; single-device
falls back to a dense ``top_k``.

Input: JSON file mapping user id -> item-id list (chronological), or a JSON
list of sequences. Output: JSONL of {user, items: [...], scores: [...]}.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import SequenceDataset
from ..data.device_pipeline import assemble_for_config
from ..models.heads import RecformerForSeqRec, similarity_scores
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
    p.add_argument("--data_path", type=str, required=True,
                   help="dir with meta_data.json + smap.json (catalog)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--hf_tokenizer", type=str, default=None)
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--sequences", type=str, required=True,
                   help="JSON: user -> item ids, or list of sequences")
    p.add_argument("--top_k", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--encode_batch_size", type=int, default=256)
    p.add_argument("--item_embeddings", type=str, default=None,
                   help="precomputed .npy catalog (skips encoding)")
    p.add_argument("--output", type=str, default="-")
    p.add_argument("--attention_impl", choices=["dense", "chunked", "pallas"], default=None)
    p.add_argument("--hidden_act", choices=["gelu", "gelu_tanh", "relu"], default=None,
                   help="override activation: 'gelu' (exact erf) restores HF parity "
                        "for imported checkpoints; base() defaults to gelu_tanh")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    meta = read_json(os.path.join(args.data_path, "meta_data.json"))
    item2id = read_json(os.path.join(args.data_path, "smap.json"))
    id2item = {v: k for k, v in item2id.items()}
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
        item_emb = jnp.asarray(np.load(args.item_embeddings))
    else:
        item_emb = encode_all_items(
            params, model, table, config, args.encode_batch_size,
            cache_path=os.path.join(args.data_path, "preprocess", f"item_emb_{name}.npz"))

    raw = read_json(args.sequences)
    if isinstance(raw, dict):
        users = sorted(raw)
        seqs = {i: raw[u] for i, u in enumerate(users)}
    else:
        users = list(range(len(raw)))
        seqs = {i: s for i, s in enumerate(raw)}
    max_items = max(max((len(s) for s in seqs.values()), default=1), 1)
    ds = SequenceDataset(seqs, max_items=max_items)

    n_dev = jax.device_count()
    topk_fn = None
    emb_for_topk = item_emb
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.catalog import make_sharded_topk_fn
        from ..parallel.mesh import make_mesh, pad_rows_to_multiple

        mesh = make_mesh(n_data=1, n_model=n_dev)
        padded, n_items = pad_rows_to_multiple(np.asarray(item_emb), n_dev)
        emb_for_topk = jax.device_put(jnp.asarray(padded),
                                      NamedSharding(mesh, P("model", None)))
        topk_fn = make_sharded_topk_fn(mesh, config.temp, args.top_k)

    out_f = open(args.output, "w") if args.output != "-" else None
    emitted = 0
    for batch in ds.batches(args.batch_size):
        b = assemble_for_config(table, jnp.asarray(batch.item_ids),
                                jnp.asarray(batch.seq_lens), config)
        pooled = model.apply(params, b, deterministic=True).astype(jnp.float32)
        if topk_fn is not None:
            scores_k, ids_k = topk_fn(pooled, emb_for_topk)
        else:
            scores = similarity_scores(pooled, item_emb.astype(jnp.float32), config.temp)
            scores_k, ids_k = jax.lax.top_k(scores, args.top_k)
        scores_k = np.asarray(scores_k)
        ids_k = np.asarray(ids_k)
        for i in range(len(batch.valid)):
            if not batch.valid[i]:
                continue
            row = {
                "user": users[emitted],
                "items": [id2item.get(int(j), int(j)) for j in ids_k[i]],
                "scores": [round(float(s), 4) for s in scores_k[i]],
            }
            line = json.dumps(row)
            (out_f.write(line + "\n") if out_f else print(line))
            emitted += 1
    if out_f:
        out_f.close()
    print(f"[serve] recommended top-{args.top_k} for {emitted} users")
    return emitted


if __name__ == "__main__":
    main()
