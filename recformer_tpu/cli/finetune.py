"""Two-stage sequential-recommendation finetune driver.

TPU-native counterpart of ``/root/reference/finetune.py``: same data
artifacts, same two-stage schedule (stage 1 re-encodes the item catalog every
epoch; stage 2 trains with frozen embeddings), same metrics — but batches are
built on device, the trainer is a jit step, and everything runs at static
shapes.

Usage:
    python -m recformer_tpu.cli.finetune --data_path finetune_data/Scientific \
        --pretrain_ckpt ckpts/pretrain --output_dir checkpoints
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import EvalDataset, SequenceDataset
from ..models.heads import RecformerForSeqRec
from ..training.checkpoint import save_params
from ..training.loops import finetune_two_stage
from ..training.optimizer import create_optimizer
from ..training.steps import TrainState
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
    p.add_argument("--output_dir", type=str, default="checkpoints")
    p.add_argument("--pretrain_ckpt", type=str, default=None)
    p.add_argument("--hf_tokenizer", type=str, default=None,
                   help="local HF tokenizer dir (RoBERTa BPE); hash backend if absent")
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--temp", type=float, default=0.05)
    p.add_argument("--num_train_epochs", type=int, default=16)
    p.add_argument("--gradient_accumulation_steps", type=int, default=8)
    p.add_argument("--finetune_negative_sample_size", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--encode_batch_size", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--verbose", type=int, default=3)
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
    p.add_argument("--steps_per_call", type=int, default=16,
                   help="train steps per device dispatch (lax.scan over "
                        "pre-staged batches; bit-equal to sequential steps, "
                        "amortizes the ~1.8s axon-relay dispatch)")
    p.add_argument("--fix_word_embedding", action="store_true",
                   help="freeze the word-embedding table (finetune.py:272-275)")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from the rolling "
                        "per-epoch checkpoint under output_dir")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mirror_file", default=None,
                   help="append-only JSONL mirror of every dev/test metric "
                        "row, written the moment each is produced — point it "
                        "at a durable (committed) location so an interrupted "
                        "run loses checkpoints, never numbers")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    train, val, test, meta, item2id, id2item = load_finetune_artifacts(args.data_path)
    config = build_config(args, item_num=len(item2id))
    tokenizer = make_tokenizer(config, args.hf_tokenizer)

    name = os.path.basename(os.path.normpath(args.data_path))
    cache_dir = os.path.join(args.data_path, "preprocess")
    table_np = tokenize_corpus_cached(tokenizer, meta, item2id, cache_dir, name)
    table = table_to_device(table_np)

    max_items = max(len(s) for s in train.values())
    max_items = max(max_items, max(len(train.get(u, [])) + 1 for u in test))
    train_ds = SequenceDataset(train, max_items=max_items)
    val_ds = EvalDataset(train, val, test, "val", max_items=max_items)
    test_ds = EvalDataset(train, val, test, "test", max_items=max_items)

    model = RecformerForSeqRec(config)
    params = init_model_params(model, config)
    params = maybe_load_pretrained(params, args.pretrain_ckpt)

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    total = steps_per_epoch * args.num_train_epochs * 2
    tx = create_optimizer(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, total_steps=total,
        grad_accum_steps=args.gradient_accumulation_steps,
    )
    if args.fix_word_embedding:
        import optax

        def label_fn(params):
            def mark(path, _):
                return "frozen" if any(
                    getattr(k, "key", None) == "word_embeddings" for k in path
                ) else "train"
            return jax.tree_util.tree_map_with_path(mark, params)

        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    resume_dir = os.path.join(args.output_dir, name, "loop_state")
    if not args.resume and os.path.exists(os.path.join(resume_dir, "loop.json")):
        # a stale rolling checkpoint from a prior run must not silently hijack
        # a fresh launch
        raise SystemExit(f"{resume_dir} holds an interrupted run; pass "
                         "--resume to continue it or remove the directory")
    state, item_embeddings, test_metrics = finetune_two_stage(
        state, model, table, config, train_ds, val_ds, test_ds,
        num_epochs=args.num_train_epochs, batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size, encode_batch_size=args.encode_batch_size,
        verbose=args.verbose, rng=jax.random.PRNGKey(args.seed),
        steps_per_call=args.steps_per_call,
        encode_cache=os.path.join(cache_dir, f"item_emb_init_{name}.npz"),
        resume_dir=resume_dir, mirror_path=args.mirror_file,
    )
    print(f"Test set: {test_metrics}")
    if args.mirror_file:
        stem = args.mirror_file.rsplit(".", 1)[0]
        with open(f"{stem}_test_metrics.json", "w") as f:
            json.dump(test_metrics, f, indent=2)

    out = os.path.join(args.output_dir, name)
    os.makedirs(out, exist_ok=True)
    save_params(os.path.join(out, "best_model"), state.params)
    # the catalog the selected params were trained against is part of the
    # artifact (reference state_dict carries init_item_embedding); eval-only
    # runs consume it via `evaluate_seq --item_embeddings`
    np.save(os.path.join(out, "item_embeddings.npy"),
            np.asarray(item_embeddings.astype(jnp.float32)))
    config.save(os.path.join(out, "config.json"))
    with open(os.path.join(out, "test_metrics.json"), "w") as f:
        json.dump(test_metrics, f, indent=2)
    # the run completed: drop the rolling checkpoint so a future fresh launch
    # isn't told to --resume a finished run
    import shutil

    shutil.rmtree(resume_dir, ignore_errors=True)
    return test_metrics


if __name__ == "__main__":
    main()
