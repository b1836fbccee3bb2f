"""Capture + parse a device trace of the pretrain step (category breakdown).

Runs the same fused pretrain step as ``bench.py``, captures a ``jax.profiler``
trace around a few steps, then parses the trace.json.gz offline and prints
per-category device time (the workflow behind docs/PERF.md's device-profile
table; the reference has no profiling at all, SURVEY §5.1).

Usage: python benchmarks/profile_step.py [--steps 3] [--logdir /tmp/rec_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def build_step(batch_size: int):
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_table
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step
    from recformer_tpu.data.device_pipeline import make_pretrain_batch

    cfg = RecformerConfig.base()
    n_items, s_in = 10000, 32
    table = _synthetic_table(cfg, n_items)
    rng_np = np.random.default_rng(0)
    item_ids = jnp.asarray(rng_np.integers(0, n_items, size=(batch_size, s_in)).astype(np.int32))
    seq_lens = jnp.asarray(rng_np.integers(s_in // 2, s_in + 1, size=batch_size).astype(np.int32))

    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=5e-5, warmup_steps=100, total_steps=10000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = jax.jit(make_pretrain_step(cfg, model))
    rng = jax.random.PRNGKey(1)
    return state, rng, table, item_ids, seq_lens, step


CATEGORIES = (
    ("pallas_attention", ("band_core", "_fwd_kernel", "_bwd_kernel", "custom-call")),
    ("matmul (conv fusions)", ("convolution", "dot.", "dot_general")),
    ("rng", ("rng-bit-generator", "rng_bit")),
    ("copy/format", ("copy", "transpose", "bitcast", "concatenate", "pad.", "slice")),
    ("fusion (elementwise/LN/other)", ("fusion",)),
    ("dynamic-update/scatter", ("dynamic-update", "scatter")),
    ("reduce", ("reduce",)),
)


def classify(name: str) -> str:
    low = name.lower()
    for cat, pats in CATEGORIES:
        for p in pats:
            if p in low:
                return cat
    return "other"


def parse_trace(logdir: str, steps: int):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no trace found under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device tracks: pids whose process_name metadata mentions TPU/device,
    # and within them ONLY the "XLA Ops" thread — module-level tracks span
    # whole steps and would double-count everything
    dev_pids = set()
    op_tids = set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        args = ev.get("args", {})
        if ev.get("name") == "process_name":
            pname = args.get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                dev_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name" and "XLA Ops" in args.get("name", ""):
            op_tids.add((ev["pid"], ev["tid"]))
    per_cat = collections.Counter()
    per_op = collections.Counter()
    op_bytes = collections.Counter()
    for ev in events:
        if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                and (ev["pid"], ev.get("tid")) in op_tids and "dur" in ev):
            name = ev.get("name", "")
            args = ev.get("args", {})
            cat = args.get("hlo_category") or classify(name)
            per_cat[cat] += ev["dur"]
            per_op[name] += ev["dur"]
            op_bytes[name] += int(args.get("bytes_accessed", 0))
    total = sum(per_cat.values())
    print(f"\ndevice total: {total / 1e3 / steps:.1f} ms/step over {steps} steps")
    for cat, us in per_cat.most_common():
        print(f"  {cat:34s} {us / 1e3 / steps:8.1f} ms/step  {us / total * 100:5.1f}%")
    print("\ntop 25 ops:")
    for name, us in per_op.most_common(25):
        gbps = op_bytes[name] / (us * 1e-6) / 1e9 if us else 0.0
        print(f"  {us / 1e3 / steps:8.2f} ms/step  {gbps:6.0f} GB/s  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/rec_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        state, rng, table, item_ids, seq_lens, step = build_step(args.batch_size)
        state, m = step(state, rng, table, item_ids, seq_lens)
        np.asarray(m["loss"])  # compile + warm, hard barrier
        jax.profiler.start_trace(args.logdir)
        for _ in range(args.steps):
            state, m = step(state, rng, table, item_ids, seq_lens)
        np.asarray(m["loss"])
        jax.profiler.stop_trace()
    parse_trace(args.logdir, args.steps)


if __name__ == "__main__":
    main()
