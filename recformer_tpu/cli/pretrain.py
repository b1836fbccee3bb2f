"""Pretraining driver: MLM + in-batch item-item contrastive retrieval.

TPU-native counterpart of ``/root/reference/lightning_pretrain.py`` (whose
trainer stack was Lightning + DeepSpeed ZeRO-2 fp16): a jit train step over a
device mesh (data-parallel via GSPMD), bf16 compute, device-side batch
construction, orbax checkpoints selected on contrastive dev accuracy.

Data contract: ``--train_file``/``--dev_file`` are JSON lists of item-id
sequences (the reference's ClickDataset rows,
``lightning_dataloader.py:6-22``), ``--item_attr_file`` maps item id ->
attribute dict, with ``--item2id_file`` mapping raw ids to dense ints.
"""

from __future__ import annotations

import argparse
import os
import signal
import time

import jax
import jax.numpy as jnp
import jax.profiler
import numpy as np

from ..data.datasets import SequenceDataset
from ..models.heads import RecformerForPretraining
from ..parallel.mesh import make_mesh
from ..training.checkpoint import (
    TopKCheckpointManager,
    restore_train_state,
    save_params,
    save_train_state,
)
from ..training.metrics import AverageMeterSet
from ..training.optimizer import create_optimizer
from ..training.steps import (
    TrainState,
    make_multi_step,
    make_pretrain_eval_step,
    make_pretrain_step,
)
from ..utils.io import read_json
from ..utils.logging import MetricsLogger
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
    p.add_argument("--train_file", type=str, default="train.json")
    p.add_argument("--dev_file", type=str, default="dev.json")
    p.add_argument("--item_attr_file", type=str, default="meta_data.json")
    p.add_argument("--item2id_file", type=str, default="smap.json")
    p.add_argument("--output_dir", type=str, default="pretrain_ckpts")
    p.add_argument("--longformer_ckpt", type=str, default=None,
                   help="HF Longformer torch .bin to initialize from")
    p.add_argument("--hf_tokenizer", type=str, default=None)
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--num_train_epochs", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8, help="per-device batch size")
    p.add_argument("--gradient_accumulation_steps", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--temp", type=float, default=0.05)
    p.add_argument("--mlm_weight", type=float, default=0.1)
    p.add_argument("--attention_impl", default=None,
                   choices=["dense", "chunked", "pallas", "sequence_parallel"])
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard attention heads + FFN over a 'model' mesh axis "
                        "of this size (Megatron-style column/row parallel; "
                        "composes with data parallelism on the rest)")
    p.add_argument("--pipeline", type=int, default=1,
                   help="split the encoder stack over a 'pipe' mesh axis of "
                        "this size (GPipe schedule; requires --scan_layers)")
    p.add_argument("--microbatches", type=int, default=2,
                   help="GPipe microbatches per step (with --pipeline)")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="shard the token dim over a 'seq' mesh axis of this "
                        "size (with --attention_impl sequence_parallel)")
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
    p.add_argument("--ln_impl", choices=["xla", "pallas_bwd", "split_bwd"], default=None,
                   help="encoder-block LayerNorm implementation (perf knob; "
                        "see config.ln_impl)")
    p.add_argument("--save_top_k", type=int, default=5)
    p.add_argument("--zero", action="store_true",
                   help="ZeRO-1-style optimizer-state sharding over the data axis")
    p.add_argument("--fix_word_embedding", action="store_true")
    p.add_argument("--valid_step_interval", type=int, default=2000)
    p.add_argument("--valid_batches", type=int, default=0,
                   help="cap dev validation at this many batches; 0 = the "
                        "full dev set (reference validates the full set, "
                        "lightning_pretrain.py:127-132)")
    p.add_argument("--resume", action="store_true",
                   help="resume params+optimizer+step from output_dir/state")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="scan this many steps inside one device launch "
                        "(amortizes host dispatch; metrics print per call)")
    p.add_argument("--log_dir", type=str, default=None,
                   help="JSONL (+TensorBoard if available) metrics directory")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mirror_file", default=None,
                   help="append-only JSONL mirror of every logged metric row "
                        "(durable location; survives loss of output_dir)")
    return p.parse_args(argv)


def _resolve_parallelism(args, config):
    """One-flag strategy selection (the reference's single-strategy switch,
    ``lightning_pretrain.py:137-143``): returns (config, mesh, mode) with
    mode in {'dp','tp','pp','sp'}. Every model-parallel mode composes with
    data parallelism over the remaining devices; composing model-parallel
    modes with each other is not wired."""
    n_dev = jax.device_count()
    modes = {"tp": args.tensor_parallel, "pp": args.pipeline,
             "sp": args.sequence_parallel}
    active = [m for m, v in modes.items() if v > 1]
    if len(active) > 1:
        raise SystemExit("pick at most one of --tensor_parallel / --pipeline "
                         "/ --sequence_parallel > 1")
    if (args.attention_impl == "sequence_parallel") != (args.sequence_parallel > 1):
        raise SystemExit("--attention_impl sequence_parallel and "
                         "--sequence_parallel N>1 go together")
    mode = active[0] if active else "dp"
    if mode != "dp" and args.zero:
        raise SystemExit("--zero composes with plain data parallelism only "
                         "(tp already shards optimizer state with the params)")
    if mode == "dp":
        return config, make_mesh() if n_dev > 1 else None, mode
    n_model = modes[mode]
    if n_dev % n_model:
        raise SystemExit(f"device count {n_dev} not divisible by {n_model}")
    if mode == "tp":
        from ..parallel.tensor import tp_config, validate_tp_config

        mesh = make_mesh(n_model=n_model)
        config = tp_config(config)
        validate_tp_config(config, mesh)
        return config, mesh, mode
    from jax.sharding import Mesh

    second = {"pp": "pipe", "sp": config.sequence_axis}[mode]
    if mode == "pp" and not config.scan_layers:
        raise SystemExit("--pipeline requires --scan_layers (stacked layer "
                         "params with a leading layer axis)")
    if mode == "sp":
        # SP shards the full-length k_g/v_g tensors (see parallel/sequence.py)
        config = config.replace(global_kv_mode="full")
    mesh = Mesh(np.array(jax.devices()[: n_dev]).reshape(
        n_dev // n_model, n_model), ("data", second))
    return config, mesh, mode


def main(argv=None):
    args = parse_args(argv)
    config = build_config(args)
    config, mesh, parallel_mode = _resolve_parallelism(args, config)
    tokenizer = make_tokenizer(config, args.hf_tokenizer)

    train_seqs = read_json(os.path.join(args.data_path, args.train_file)) \
        if args.train_file.endswith(".json") else None
    if isinstance(train_seqs, dict):
        train_seqs = list(train_seqs.values())
    dev_path = os.path.join(args.data_path, args.dev_file)
    dev_seqs = read_json(dev_path) if os.path.exists(dev_path) else train_seqs
    if isinstance(dev_seqs, dict):
        dev_seqs = list(dev_seqs.values())

    meta = read_json(os.path.join(args.data_path, args.item_attr_file))
    item2id = read_json(os.path.join(args.data_path, args.item2id_file))

    def to_int_ids(seqs):
        """Accept reference-format sequences of raw item keys (asin strings,
        ``pretrain_data/interaction_data_process.py:69-82``) as well as dense
        int ids; unknown items are dropped."""
        out = []
        for s in seqs:
            if s and isinstance(s[0], str):
                s = [item2id[a] for a in s if a in item2id]
            if s:
                out.append(s)
        return out

    train_seqs = to_int_ids(train_seqs)
    dev_seqs = to_int_ids(dev_seqs)
    table_np = tokenize_corpus_cached(
        tokenizer, meta, item2id, os.path.join(args.data_path, "preprocess"), "pretrain"
    )
    table = table_to_device(table_np)

    # global batch scales with the DATA extent only (model-parallel axes
    # replicate the batch)
    n_data = mesh.shape.get("data", 1) if mesh is not None else 1
    global_batch = args.batch_size * n_data
    if parallel_mode == "pp" and global_batch % args.microbatches:
        raise SystemExit(f"global batch {global_batch} must be divisible by "
                         f"--microbatches {args.microbatches}")

    max_items = max(len(s) for s in train_seqs)
    train_ds = SequenceDataset({i: s for i, s in enumerate(train_seqs)}, max_items=max_items)
    dev_ds = SequenceDataset({i: s for i, s in enumerate(dev_seqs)}, max_items=max_items)

    model = RecformerForPretraining(config)
    # SP attention only traces inside its shard_map: init/eval use the
    # chunked impl on the IDENTICAL param tree (attention_impl is weight-free)
    eval_model = (RecformerForPretraining(config.replace(attention_impl="chunked"))
                  if parallel_mode == "sp" else model)
    params = init_model_params(eval_model, config, with_mlm=True)
    params = maybe_load_pretrained(params, args.longformer_ckpt)
    if parallel_mode == "tp":
        from ..parallel.tensor import shard_params_tp

        params = shard_params_tp(params, mesh)

    steps_per_epoch = max(1, len(train_ds) // global_batch)
    total = steps_per_epoch * args.num_train_epochs
    tx = create_optimizer(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, total_steps=total,
        grad_accum_steps=args.gradient_accumulation_steps,
    )
    if args.fix_word_embedding:
        import optax

        # zero updates for the word-embedding table
        # (reference --fix_word_embedding, lightning_pretrain.py:120-123)
        def label_fn(params):
            def mark(path, _):
                return "frozen" if any(
                    getattr(k, "key", None) == "word_embeddings" for k in path
                ) else "train"
            return jax.tree_util.tree_map_with_path(mark, params)

        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, label_fn)

    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state_dir = os.path.join(args.output_dir, "state")
    if args.resume and os.path.isdir(state_dir):
        state = restore_train_state(state_dir, state)
        print(f"[pretrain] resumed at step {int(state.step)}")
    if args.zero and mesh is not None:
        from ..parallel.mesh import shard_optimizer_state

        state = shard_optimizer_state(state, mesh)
    if parallel_mode == "tp":
        # zero=True keeps the TP-committed param/opt-state shardings
        step = make_pretrain_step(config, model, mesh=mesh, zero=True)
    elif parallel_mode == "pp":
        from ..parallel.pipeline import make_pipeline_pretrain_step

        step = make_pipeline_pretrain_step(config, model, mesh,
                                           num_microbatches=args.microbatches)
    elif parallel_mode == "sp":
        from ..parallel.sequence import make_sp_pretrain_step

        step = make_sp_pretrain_step(config, model, mesh)
    else:
        step = make_pretrain_step(config, model, mesh=mesh, zero=args.zero)
    multi_step = make_multi_step(step, args.steps_per_call) if args.steps_per_call > 1 else None
    eval_step = make_pretrain_eval_step(
        eval_model.config, eval_model, mesh=mesh,
        keep_param_sharding=(parallel_mode == "tp"))

    rng = jax.random.PRNGKey(args.seed)
    preempt = _install_preemption_handler()
    best_acc = -1.0
    os.makedirs(args.output_dir, exist_ok=True)
    topk = TopKCheckpointManager(os.path.join(args.output_dir, "topk"),
                                 k=args.save_top_k, mode="max")
    logger = MetricsLogger(args.log_dir or os.path.join(args.output_dir, "logs"),
                           mirror_path=args.mirror_file)
    meters = AverageMeterSet()
    global_step = 0
    last_log_step = 0
    t0 = time.time()
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for epoch in range(args.num_train_epochs):
            pending_ids, pending_lens = [], []
            for batch in train_ds.batches(global_batch, shuffle=True, seed=epoch,
                                          drop_last=True,
                                          process_index=jax.process_index(),
                                          process_count=jax.process_count()):
                if args.profile_dir and global_step == 10:
                    jax.profiler.start_trace(args.profile_dir)
                prev_step = global_step
                if multi_step is not None:
                    pending_ids.append(batch.item_ids)
                    pending_lens.append(batch.seq_lens)
                    if len(pending_ids) < args.steps_per_call:
                        continue
                    state, trace = multi_step(
                        state, rng, table,
                        jnp.asarray(np.stack(pending_ids)),
                        jnp.asarray(np.stack(pending_lens)),
                    )
                    pending_ids, pending_lens = [], []
                    # the scan carries the FULL per-step metric dict out; log
                    # the mean over this call's steps (real values, not a
                    # fabricated accuracy)
                    metrics = {k: jnp.mean(v.astype(jnp.float32))
                               for k, v in trace.items()}
                    global_step += args.steps_per_call
                else:
                    state, metrics = step(state, rng, table,
                                          jnp.asarray(batch.item_ids),
                                          jnp.asarray(batch.seq_lens))
                    global_step += 1
                if args.profile_dir and global_step >= 15 and global_step < 15 + args.steps_per_call:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                # fire on "crossed the interval": with steps_per_call > 1 the
                # step counter advances in strides, so `% == 0` can skip every
                # boundary (e.g. steps_per_call=3, interval=4)
                if _crossed(50, prev_step, global_step):
                    m = {k: float(v) for k, v in metrics.items()}
                    n_done = global_step - last_log_step
                    rate = global_batch * n_done / (time.time() - t0)
                    t0 = time.time()
                    last_log_step = global_step
                    m["examples_per_sec"] = rate
                    logger.log(global_step, m)
                    print(f"[pretrain] step {global_step} loss {m['loss']:.4f} "
                          f"acc {m['accuracy']:.4f} ({rate:.1f} ex/s)")
                if _crossed(args.valid_step_interval, prev_step, global_step):
                    acc = _validate(eval_step, state, rng, table, dev_ds,
                                    global_batch, args.valid_batches)
                    logger.log(global_step, {"dev_accuracy": acc})
                    print(f"[pretrain] dev accuracy {acc:.4f}")
                    topk.save(state.params, global_step, acc)
                    if acc > best_acc:
                        best_acc = acc
                        save_params(os.path.join(args.output_dir, "best"), state.params)
                if preempt["signal"]:
                    save_train_state(state_dir, state)
                    save_params(os.path.join(args.output_dir, "last"), state.params)
                    logger.log(global_step, {"preempted": 1.0})
                    print(f"[pretrain] preemption checkpoint at step "
                          f"{global_step} (signal {preempt['signal']}); "
                          "restart with --resume (the interrupted epoch "
                          "restarts from its first batch)", flush=True)
                    return
            acc = _validate(eval_step, state, rng, table, dev_ds, global_batch,
                            args.valid_batches)
            print(f"[pretrain] epoch {epoch} dev accuracy {acc:.4f}")
            topk.save(state.params, global_step, acc)
            if acc > best_acc:
                best_acc = acc
                save_params(os.path.join(args.output_dir, "best"), state.params)
            save_params(os.path.join(args.output_dir, "last"), state.params)
            save_train_state(state_dir, state)
    config.save(os.path.join(args.output_dir, "config.json"))
    print(f"[pretrain] done; best dev accuracy {best_acc:.4f}")


def _install_preemption_handler():
    """Failure-recovery: catch SIGTERM/SIGINT (preemption, Ctrl-C) and
    request a clean checkpoint at the next step boundary instead of dying
    mid-step. The reference's only resume mechanism is Lightning's
    ``ckpt_path`` (``lightning_pretrain.py:41,147``) — epoch-granular; here
    the FULL TrainState (params + optimizer + step) is saved at the signal
    and ``--resume`` continues from it."""
    flag = {"signal": 0}

    def handler(signum, frame):
        flag["signal"] = signum
        print(f"[pretrain] caught signal {signum}; checkpointing at the next "
              "step boundary", flush=True)

    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(s, handler)
        except ValueError:  # pragma: no cover - non-main thread
            pass
    return flag


def _crossed(interval: int, prev_step: int, step: int) -> bool:
    """True when [prev_step, step] crossed a multiple of ``interval``."""
    return interval > 0 and step // interval > prev_step // interval


def _validate(eval_step, state, rng, table, dev_ds, batch_size, max_batches=0):
    """Contrastive dev accuracy. ``max_batches=0`` evaluates the full dev set
    (the reference's behavior); a positive cap subsamples and says so."""
    correct = total = None
    for i, batch in enumerate(dev_ds.batches(batch_size, drop_last=True)):
        if max_batches and i >= max_batches:
            print(f"[pretrain] dev subsampled to {max_batches} batches "
                  f"(--valid_batches)")
            break
        out = eval_step(state.params, jax.random.fold_in(rng, i), table,
                        jnp.asarray(batch.item_ids), jnp.asarray(batch.seq_lens))
        # device-side accumulation; one host transfer at the end
        correct = out["cl_correct"] if correct is None else correct + out["cl_correct"]
        total = out["cl_total"] if total is None else total + out["cl_total"]
    if total is None:
        return 0.0
    return float(correct) / max(float(total), 1.0)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
