"""Benchmark harness: throughput on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Default task: end-to-end pretrain examples/s/chip on the canonical
Recformer-base recipe (12-layer Longformer backbone, window 64, 1024-token
sequences, dual-tower contrastive + fused MLM towers, device-side batch
construction). ``--task encode`` measures the item-encoding service (items/s),
``--task eval`` the full-catalog ranked-eval path (users/s).

N steps run inside one ``lax.scan`` jit and the result is materialized on the
host (a hard barrier — plain ``block_until_ready`` does not reliably wait
through the axon relay), so the figure is device time + one transfer,
amortized per step.

The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` is the ratio vs the first value this harness ever recorded per
config (stored in .bench_reference.json): round-over-round speedup; 1.0 on
first run.
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _timed(run, *args):
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[-1])  # compile + warm run, hard barrier
    t0 = time.perf_counter()
    out = run(*args)
    final = np.asarray(jax.tree.leaves(out)[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(final, dtype=np.float64)).all()
    return dt


def _pretrain_run_n(cfg, steps):
    """The jitted N-step pretrain program shared by the measuring and
    compile-only paths (identical jaxpr => identical persistent-cache key)."""
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.training.steps import make_pretrain_step

    model = RecformerForPretraining(cfg)
    step = make_pretrain_step(cfg, model)

    # donate the train state: without donation the scan holds input + output
    # + carry copies of the ~1.3 GB optimizer state simultaneously
    @functools.partial(jax.jit, donate_argnums=0)
    def run_n(state, rng, table, item_ids, seq_lens):
        def body(s, _):
            s, m = step(s, rng, table, item_ids, seq_lens)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    return model, run_n


def _pretrain_state_maker(cfg, model, table, item_ids, seq_lens):
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState

    def make_state():
        ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids,
                                     seq_lens, cfg)
        params = model.init(jax.random.PRNGKey(0), ba, bb)
        tx = create_optimizer(learning_rate=5e-5, warmup_steps=100,
                              total_steps=10000)
        return TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    return make_state


def compile_pretrain(cfg, table, item_ids, seq_lens, steps):
    """Lower + compile the exact bench_pretrain program WITHOUT running
    anything on the accelerator (all arguments abstract via eval_shape), so a
    cold persistent compile cache can be warmed while another job owns the
    chip. A later real `bench.py` run then hits the cache and measures in
    seconds instead of paying a 5-30 min remote compile."""
    model, run_n = _pretrain_run_n(cfg, steps)
    make_state = _pretrain_state_maker(cfg, model, table, item_ids, seq_lens)
    state_shape = jax.eval_shape(make_state)
    rng_shape = jax.eval_shape(lambda: jax.random.PRNGKey(1))
    abstract = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                            (table, item_ids, seq_lens))
    t0 = time.perf_counter()
    run_n.lower(state_shape, rng_shape, *abstract).compile()
    return time.perf_counter() - t0


def bench_pretrain(cfg, table, item_ids, seq_lens, steps):
    model, run_n = _pretrain_run_n(cfg, steps)
    state = _pretrain_state_maker(cfg, model, table, item_ids, seq_lens)()
    rng = jax.random.PRNGKey(1)

    state, losses = run_n(state, rng, table, item_ids, seq_lens)
    np.asarray(losses)  # compile + warm run; hard barrier
    t0 = time.perf_counter()
    state, losses = run_n(state, rng, table, item_ids, seq_lens)
    final = np.asarray(losses)
    dt = time.perf_counter() - t0
    assert np.isfinite(final).all()
    B = item_ids.shape[0]
    return steps * B / dt, "pretrain_examples_per_sec_per_chip", "examples/s/chip"


def _encode_program(cfg, table, steps, batch_size):
    """(run_n, make_args) for the encode task — shared by the measuring and
    compile-only paths so the persistent-cache key is identical."""
    from recformer_tpu.models.heads import RecformerForSeqRec
    from recformer_tpu.training.steps import make_encode_items_step

    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.item_seq_len), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    step = make_encode_items_step(cfg, model)
    n_items = int(table["lengths"].shape[0]) - 1

    def make_args():
        params = model.init(jax.random.PRNGKey(0), dummy)
        # DIFFERENT chunk per scan step: a loop-invariant body would be
        # hoisted out of the scan by XLA and the measurement would be fiction
        chunks = jnp.asarray(np.random.default_rng(0).integers(
            0, n_items, size=(steps, batch_size)).astype(np.int32))
        return params, table, chunks

    @jax.jit
    def run_n(params, table, chunks):
        def body(c, chunk):
            emb = step(params, table, chunk)
            return c + emb.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), chunks)
        return acc

    return run_n, make_args


def bench_encode(cfg, table, item_ids, seq_lens, steps, batch_size):
    run_n, make_args = _encode_program(cfg, table, steps, batch_size)
    dt = _timed(run_n, *make_args())
    return steps * batch_size / dt, "item_encode_items_per_sec_per_chip", "items/s/chip"


def _eval_program(cfg, table, item_ids, seq_lens, steps, n_items):
    """(run_n, make_args) for the ranked-eval task (see _encode_program)."""
    from recformer_tpu.models.heads import RecformerForSeqRec
    from recformer_tpu.training.steps import make_eval_step

    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    step = make_eval_step(cfg, model)
    B = item_ids.shape[0]
    S_in = item_ids.shape[1]

    def make_args():
        params = model.init(jax.random.PRNGKey(0), dummy)
        rng = np.random.default_rng(0)
        # different batch per scan step (see _encode_program on LICM)
        ids_stack = jnp.asarray(rng.integers(0, n_items, size=(steps, B, S_in)).astype(np.int32))
        lens_stack = jnp.asarray(rng.integers(S_in // 2, S_in + 1, size=(steps, B)).astype(np.int32))
        labels_stack = jnp.asarray(rng.integers(0, n_items, size=(steps, B)).astype(np.int32))
        valid = jnp.ones(B, bool)
        item_emb = jnp.asarray(rng.standard_normal((n_items, cfg.hidden_size)).astype(np.float32))
        return params, table, ids_stack, lens_stack, labels_stack, valid, item_emb

    @jax.jit
    def run_n(params, table, ids_stack, lens_stack, labels_stack, valid, item_emb):
        def body(c, xs):
            ids, lens, labels = xs
            out = step(params, table, ids, lens, labels, valid, item_emb)
            return c + out["NDCG@10"], None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), (ids_stack, lens_stack, labels_stack))
        return acc

    return run_n, make_args


def bench_eval(cfg, table, item_ids, seq_lens, steps, n_items):
    run_n, make_args = _eval_program(cfg, table, item_ids, seq_lens, steps, n_items)
    dt = _timed(run_n, *make_args())
    return steps * item_ids.shape[0] / dt, "eval_users_per_sec_per_chip", "users/s/chip"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["base", "tiny"], default="base")
    ap.add_argument("--task", choices=["pretrain", "encode", "eval"], default="pretrain")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--attention", choices=["pallas", "chunked", "dense"], default="pallas")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", choices=["full", "save_attention", "dots", "dots_attn"],
                    default="full")
    ap.add_argument("--scan_unroll", type=int, default=1)
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--no-dropout", action="store_true", dest="no_dropout")
    ap.add_argument("--ln", choices=["xla", "pallas_bwd", "split_bwd"], default="xla")
    ap.add_argument("--compile-only", action="store_true", dest="compile_only",
                    help="lower+compile the pretrain program for this config "
                         "(warming the persistent cache) without any device "
                         "execution, then exit — safe to run while another "
                         "job owns the chip")
    args = ap.parse_args()

    from __graft_entry__ import _synthetic_table
    from recformer_tpu.config import RecformerConfig

    if args.model == "base":
        cfg = RecformerConfig.base(attention_impl=args.attention, remat=args.remat,
                                   remat_policy=args.remat_policy,
                                   scan_layers=args.scan_layers, ln_impl=args.ln,
                                   scan_unroll=args.scan_unroll)
        n_items, s_in = 10000, 32
    else:
        cfg = RecformerConfig.tiny(attention_impl=args.attention, remat=args.remat,
                                   remat_policy=args.remat_policy,
                                   scan_layers=args.scan_layers, ln_impl=args.ln)
        n_items, s_in = 200, 12

    if args.no_dropout:
        cfg = cfg.replace(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    table = _synthetic_table(cfg, n_items)
    rng_np = np.random.default_rng(0)
    B = args.batch_size
    item_ids = jnp.asarray(rng_np.integers(0, n_items, size=(B, s_in)).astype(np.int32))
    seq_lens = jnp.asarray(rng_np.integers(s_in // 2, s_in + 1, size=B).astype(np.int32))

    if args.compile_only:
        if args.task == "pretrain":
            dt = compile_pretrain(cfg, table, item_ids, seq_lens, args.steps)
        else:
            if args.task == "encode":
                run_n, make_args = _encode_program(cfg, table, args.steps,
                                                   max(args.batch_size, 128))
            else:
                run_n, make_args = _eval_program(cfg, table, item_ids, seq_lens,
                                                 args.steps, n_items)
            args_shape = jax.eval_shape(make_args)
            t0 = time.perf_counter()
            run_n.lower(*args_shape).compile()
            dt = time.perf_counter() - t0
        print(json.dumps({"compiled": True, "task": args.task,
                          "seconds": round(dt, 1)}))
        return

    if args.task == "pretrain":
        rate, metric, unit = bench_pretrain(cfg, table, item_ids, seq_lens, args.steps)
    elif args.task == "encode":
        rate, metric, unit = bench_encode(cfg, table, item_ids, seq_lens, args.steps,
                                          max(args.batch_size, 128))
    else:
        rate, metric, unit = bench_eval(cfg, table, item_ids, seq_lens, args.steps, n_items)

    rate /= jax.device_count()

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_reference.json")
    key = f"{args.task}-{args.model}-{args.attention}-b{args.batch_size}" + (
        "-scan" if args.scan_layers else "") + ("-remat" if args.remat else "") + (
        f"-{args.remat_policy}" if args.remat and args.remat_policy != "full" else "") + (
        "-nodrop" if args.no_dropout else "") + (
        f"-u{args.scan_unroll}" if args.scan_unroll > 1 else "") + (
        "-plnbwd" if getattr(args, "ln", "xla") == "pallas_bwd" else "") + (
        "-plnsplit" if getattr(args, "ln", "xla") == "split_bwd" else "")
    record = {}
    if os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                record = json.load(f)
        except Exception:
            record = {}

    def vs_baseline(k, r):
        b = record.get(k)
        if b is None:
            record[k] = b = r
            with open(ref_path, "w") as f:
                json.dump(record, f)
        return r / b

    out = {
        "metric": metric,
        "value": round(rate, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline(key, rate), 3),
    }

    # PRODUCTION config report. Round-3 sweep verdict (runs/unroll_sweep.jsonl,
    # docs/PERF.md): at B=16/L=1024 the unrolled no-remat program IS the
    # production config — it fits HBM and is the fastest by a wide margin
    # (77.7 vs remat-only 69.5, scan+remat 65.0, scan-unroll 2/3 56.7/54.3,
    # scan-no-remat OOM), and the compile-time rationale for the scanned
    # config fell once the cold compile was measured at 135 s with
    # persistent-cache reruns in seconds. scan+remat remains the
    # memory-constrained fallback (larger batch/context), not the default.
    # production_vs_baseline stays anchored at the round-2 production
    # config's first-recorded value (scan-remat-dots_attn, 64.96) so the
    # metric keeps tracking round-over-round improvement of what real
    # training runs use.
    if (args.task == "pretrain" and args.model == "base"
            and not args.scan_layers and not args.remat):
        anchor = (f"pretrain-{args.model}-{args.attention}-b{args.batch_size}"
                  "-scan-remat-dots_attn"
                  + ("-nodrop" if args.no_dropout else "")
                  + ("-plnbwd" if args.ln == "pallas_bwd" else "")
                  + ("-plnsplit" if args.ln == "split_bwd" else ""))
        out["production_config"] = "unrolled-noremat"
        out["production_value"] = out["value"]
        # read-only lookup: the anchor names a scan+remat config that this
        # (unrolled) run did NOT execute — recording rate under it would
        # persist an unrolled number as a scan-config baseline (advisor r3)
        anchor_base = record.get(anchor)
        if anchor_base is not None:
            out["production_vs_baseline"] = round(rate / anchor_base, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
