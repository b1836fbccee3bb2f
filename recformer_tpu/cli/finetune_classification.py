"""Fraud-detection finetune driver (binary sequence classification).

TPU-native counterpart of ``/root/reference/finetune_classification.py``:
backbone + 3-layer MLP head, BCE-with-logits with a ``pos_weight`` computed
from the training-label imbalance scaled by 0.2
(``finetune_classification.py:294-323,433``), per-epoch item re-encoding,
threshold-sweep F1 selection, early stopping on F1, JSON metric dumps.

Data contract: train/val/test JSON mapping user -> [sequence, [label]]
(the transactional pipeline's classification artifacts).

Deliberate fix vs the reference (flagged per SURVEY §7.4 policy): the
reference re-encodes the full item catalog every epoch
(``finetune_classification.py:477-485``) even though the fraud forward pass
never reads the item-embedding table (``models.py:665-713``) — pure wasted
compute. This driver skips that re-encode.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import FraudDataset
from ..models.heads import RecformerForFraudDetection
from ..training.checkpoint import save_params
from ..training.loops import evaluate_fraud
from ..training.optimizer import create_optimizer
from ..training.steps import TrainState, make_fraud_train_step
from ..utils.io import read_json
from ..utils.logging import append_jsonl
from .common import (
    build_config,
    init_model_params,
    make_tokenizer,
    maybe_load_pretrained,
    table_to_device,
    tokenize_corpus_cached,
)


def calculate_pos_weight(dataset: FraudDataset, scale: float = 0.2) -> float:
    """neg/pos ratio scaled by 0.2 (``finetune_classification.py:294-323``)."""
    labels = np.asarray(dataset.labels, np.float32)
    pos = float(labels.sum())
    neg = float(len(labels) - pos)
    if pos == 0:
        return 1.0
    return max(1.0, (neg / pos) * scale)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--train_file", type=str, default="train.json")
    p.add_argument("--dev_file", type=str, default="val.json")
    p.add_argument("--test_file", type=str, default="test.json")
    p.add_argument("--meta_file", type=str, default="meta_data.json")
    p.add_argument("--item2id_file", type=str, default="smap.json")
    p.add_argument("--output_dir", type=str, default="checkpoints_fraud")
    p.add_argument("--pretrain_ckpt", type=str, default=None)
    p.add_argument("--hf_tokenizer", type=str, default=None)
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--num_train_epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--head_lr", type=float, default=None,
                   help="separate LR for the fresh 3-layer MLP head "
                        "(discriminative finetuning: encoder at "
                        "--learning_rate, head at --head_lr; the reference's "
                        "single 5e-5 cannot train the random-init head within "
                        "the fraud step budget — docs/RESULTS.md leg 3)")
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--patience", type=int, default=3)
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from the rolling "
                        "per-epoch checkpoint under output_dir")
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
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mirror_file", default=None,
                   help="append-only JSONL mirror of every epoch/test metric "
                        "row (durable location; survives loss of output_dir)")
    return p.parse_args(argv)


def _load_fraud_split(path):
    raw = read_json(path, as_int=True)
    return raw


def main(argv=None):
    args = parse_args(argv)
    train_raw = _load_fraud_split(os.path.join(args.data_path, args.train_file))
    val_raw = _load_fraud_split(os.path.join(args.data_path, args.dev_file))
    test_raw = _load_fraud_split(os.path.join(args.data_path, args.test_file))
    meta = read_json(os.path.join(args.data_path, args.meta_file))
    item2id = read_json(os.path.join(args.data_path, args.item2id_file))

    max_items = max(len(v[0]) for v in train_raw.values())
    train_ds = FraudDataset(train_raw, max_items=max_items)
    val_ds = FraudDataset(val_raw, max_items=max_items)
    test_ds = FraudDataset(test_raw, max_items=max_items)

    pos_weight = calculate_pos_weight(train_ds)
    print(f"[fraud] pos_weight={pos_weight:.3f}")

    config = build_config(args, item_num=len(item2id)).replace(pos_weight=pos_weight)
    tokenizer = make_tokenizer(config, args.hf_tokenizer)
    name = os.path.basename(os.path.normpath(args.data_path))
    table_np = tokenize_corpus_cached(
        tokenizer, meta, item2id, os.path.join(args.data_path, "preprocess"), name
    )
    table = table_to_device(table_np)

    model = RecformerForFraudDetection(config)
    params = init_model_params(model, config)
    params = maybe_load_pretrained(params, args.pretrain_ckpt)

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    tx = create_optimizer(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        total_steps=steps_per_epoch * args.num_train_epochs,
        head_lr=args.head_lr,
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_fraud_train_step(config, model)

    rng = jax.random.PRNGKey(args.seed)
    best_f1 = -1.0
    best_params = None
    patience = args.patience
    epoch_metrics = []
    start_epoch = 0
    # epoch-granular rolling resume (same scheme as finetune_two_stage)
    resume_dir = os.path.join(args.output_dir, name, "loop_state")
    loop_meta = os.path.join(resume_dir, "loop.json")
    # the opt_state tree structure depends on the optimizer recipe (head_lr
    # switches to a multi_transform); restoring a checkpoint saved under a
    # different recipe would unflatten old leaves into the wrong structure —
    # refuse instead of crashing or silently mis-restoring (advisor r3)
    recipe = {"learning_rate": args.learning_rate, "head_lr": args.head_lr}
    if os.path.exists(loop_meta):
        if not args.resume:
            raise SystemExit(f"{resume_dir} holds an interrupted run; pass "
                             "--resume to continue it or remove the directory")
        from ..training.checkpoint import restore_params, restore_train_state

        with open(loop_meta) as f:
            meta = json.load(f)
        saved_recipe = meta.get("recipe")
        if saved_recipe != recipe:
            raise SystemExit(
                f"{resume_dir} was saved with optimizer recipe {saved_recipe} "
                f"but this run uses {recipe}; the opt_state structures are "
                "incompatible — remove the loop_state directory to start fresh")
        state = restore_train_state(os.path.join(resume_dir, "state"), state)
        best_f1, patience = meta["best_f1"], meta["patience"]
        start_epoch = meta["epoch"] + 1
        epoch_metrics = meta["epoch_metrics"]
        if os.path.isdir(os.path.join(resume_dir, "best_params")):
            best_params = jax.tree.map(
                np.asarray, restore_params(os.path.join(resume_dir, "best_params")))
        print(f"[fraud] resumed at epoch {start_epoch} "
              f"(best F1 {best_f1:.4f}, patience {patience})")

    multi_step = None
    if args.steps_per_call > 1:
        from ..training.steps import make_multi_step

        # labels + valid are per-step stacks (scan_extras=2)
        multi_step = make_multi_step(step, args.steps_per_call, scan_extras=2)

    def flush(state, pending, losses, weights):
        """Dispatch pending batches: one scanned call for a full group,
        per-batch calls for the tail (all fraud batches are shape-uniform —
        FraudDataset pads short batches with valid=0 rows). Per-call loss
        stays a device scalar (mean + weight) — ONE host transfer per epoch."""
        if multi_step is not None and len(pending) == args.steps_per_call:
            state, trace = multi_step(
                state, rng, table,
                jnp.asarray(np.stack([b.item_ids for b in pending])),
                jnp.asarray(np.stack([b.seq_lens for b in pending])),
                jnp.asarray(np.stack([b.labels for b in pending])),
                jnp.asarray(np.stack([b.valid for b in pending])))
            losses.append(jnp.mean(trace["loss"]))
            weights.append(len(pending))
        else:
            for b in pending:
                state, metrics = step(state, rng, table,
                                      jnp.asarray(b.item_ids), jnp.asarray(b.seq_lens),
                                      jnp.asarray(b.labels), jnp.asarray(b.valid))
                losses.append(metrics["loss"])
                weights.append(1)
        return state

    for epoch in range(start_epoch, args.num_train_epochs):
        losses, weights = [], []
        pending = []
        for batch in train_ds.batches(args.batch_size, shuffle=True, seed=epoch):
            pending.append(batch)
            if len(pending) == max(args.steps_per_call, 1):
                state = flush(state, pending, losses, weights)
                pending = []
        if pending:
            state = flush(state, pending, losses, weights)
        if losses:
            vals = np.asarray(jnp.stack(losses), dtype=np.float64)
            w = np.asarray(weights, dtype=np.float64)
            epoch_loss = float((vals * w).sum() / w.sum())
        else:
            epoch_loss = 0.0
        dev = evaluate_fraud(state.params, model, table, val_ds, config,
                             args.eval_batch_size)
        print(f"[fraud] epoch {epoch} loss {epoch_loss:.4f} dev {dev}")
        epoch_metrics.append({"epoch": epoch, "loss": epoch_loss, **{
            k: v for k, v in dev.items() if k != "confusion"}})
        append_jsonl(args.mirror_file, {"event": "dev", **epoch_metrics[-1]})
        improved = dev["f1"] > best_f1
        if improved:
            best_f1 = dev["f1"]
            best_params = jax.tree.map(np.asarray, state.params)
            patience = args.patience
        else:
            patience -= 1
        from ..training.checkpoint import save_train_state

        os.makedirs(resume_dir, exist_ok=True)
        save_train_state(os.path.join(resume_dir, "state"), state)
        if improved:
            save_params(os.path.join(resume_dir, "best_params"), best_params)
        with open(loop_meta, "w") as f:
            json.dump({"epoch": epoch, "best_f1": best_f1,
                       "patience": patience, "recipe": recipe,
                       "epoch_metrics": epoch_metrics}, f, default=str)
        if patience == 0:
            break

    if best_params is not None:
        state = state.replace(params=jax.tree.map(jnp.asarray, best_params))
    test_metrics = evaluate_fraud(state.params, model, table, test_ds, config,
                                  args.eval_batch_size)
    print(f"[fraud] test {test_metrics}")
    append_jsonl(args.mirror_file,
                 {"event": "test",
                  **{k: v for k, v in test_metrics.items() if k != "confusion"}})

    out = os.path.join(args.output_dir, name)
    os.makedirs(out, exist_ok=True)
    save_params(os.path.join(out, "best_model"), state.params)
    config.save(os.path.join(out, "config.json"))
    with open(os.path.join(out, "test_metrics.json"), "w") as f:
        json.dump(test_metrics, f, indent=2, default=str)
    with open(os.path.join(out, "epoch_metrics.json"), "w") as f:
        json.dump(epoch_metrics, f, indent=2)
    # completed: drop the rolling checkpoint
    import shutil

    shutil.rmtree(resume_dir, ignore_errors=True)
    return test_metrics


if __name__ == "__main__":
    main()
