"""Benchmark harness: pretraining throughput on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The measured quantity is end-to-end pretrain examples/s/chip on the canonical
Recformer-base recipe (12-layer Longformer backbone, window 64, 1024-token
sequences, dual-tower contrastive + 2 MLM towers = 4 encoder passes/step,
device-side batch construction). The reference publishes no throughput numbers
(SURVEY.md §6), so ``vs_baseline`` is the ratio against the north-star target
recorded in BASELINE.json's protocol — absent any published number we report
the ratio vs the first value this harness ever recorded (stored in
.bench_reference.json), i.e. round-over-round speedup; 1.0 on first run.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["base", "tiny"], default="base")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--attention", choices=["pallas", "chunked", "dense"], default="pallas")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from __graft_entry__ import _synthetic_table
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    if args.model == "base":
        cfg = RecformerConfig.base(attention_impl=args.attention, remat=args.remat)
        n_items, s_in = 10000, 32
    else:
        cfg = RecformerConfig.tiny(attention_impl=args.attention, remat=args.remat)
        n_items, s_in = 200, 12

    table = _synthetic_table(cfg, n_items)
    rng_np = np.random.default_rng(0)
    B = args.batch_size
    item_ids = jnp.asarray(rng_np.integers(0, n_items, size=(B, s_in)).astype(np.int32))
    seq_lens = jnp.asarray(rng_np.integers(s_in // 2, s_in + 1, size=B).astype(np.int32))

    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=5e-5, warmup_steps=100, total_steps=10000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(cfg, model)

    rng = jax.random.PRNGKey(1)

    # Drive N steps inside ONE jit with lax.scan: measures pure device time
    # per step, immune to host dispatch / tunnel round-trip latency.
    @jax.jit
    def run_n(state, rng, table, item_ids, seq_lens):
        def body(s, _):
            s, m = step(s, rng, table, item_ids, seq_lens)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=args.steps)

    state_w, losses = run_n(state, rng, table, item_ids, seq_lens)
    np.asarray(losses)  # compile + warm run; host materialization forces full sync

    t0 = time.perf_counter()
    state_w, losses = run_n(state_w, rng, table, item_ids, seq_lens)
    final_losses = np.asarray(losses)  # device->host copy == hard barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(final_losses).all()

    n_chips = jax.device_count()
    examples_per_sec = args.steps * B / dt / n_chips

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_reference.json")
    key = f"{args.model}-{args.attention}-b{args.batch_size}"
    record = {}
    if os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                record = json.load(f)
        except Exception:
            record = {}
    baseline = record.get(key)
    if baseline is None:
        record[key] = baseline = examples_per_sec
        with open(ref_path, "w") as f:
            json.dump(record, f)

    print(json.dumps({
        "metric": "pretrain_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 3),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
