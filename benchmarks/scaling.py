"""Scaling benchmark: pretrain examples/s/chip at 1 chip vs the full mesh.

Target from BASELINE.json: >= 85% scaling efficiency from 1 host to N hosts.
On a single-chip environment this reports 1-chip throughput and exits; on a
pod slice it runs the same global-batch-per-chip workload on a 1-device mesh
and on the full mesh and reports the efficiency ratio.

Usage: python benchmarks/scaling.py [--batch-per-chip 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def throughput(mesh, cfg, batch_per_chip, steps):
    from __graft_entry__ import _synthetic_table
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    n_chips = mesh.size if mesh is not None else 1
    B = batch_per_chip * n_chips
    table = _synthetic_table(cfg, 1000)
    rng_np = np.random.default_rng(0)
    item_ids = jnp.asarray(rng_np.integers(0, 1000, size=(B, 32)).astype(np.int32))
    seq_lens = jnp.asarray(rng_np.integers(16, 33, size=B).astype(np.int32))
    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=create_optimizer(total_steps=1000))
    step = make_pretrain_step(cfg, model, mesh=mesh)

    @jax.jit
    def run_n(state, rng, table, ids, lens):
        def body(s, _):
            s, m = step(s, rng, table, ids, lens)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    ctx = mesh if mesh is not None else _null()
    with ctx:
        s, losses = run_n(state, jax.random.PRNGKey(1), table, item_ids, seq_lens)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        s, losses = run_n(s, jax.random.PRNGKey(1), table, item_ids, seq_lens)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
    return steps * B / dt / n_chips


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def mode_table(batch_per_chip: int, steps: int):
    """Functional per-parallelism-mode step-time table on the CURRENT devices
    (virtual CPU mesh in CI — numbers are CPU-meaningless, the point is that
    every mode builds, runs, and is timed through the same factories the
    drivers use; VERDICT round-1 item 10)."""
    from __graft_entry__ import _synthetic_table
    from jax.sharding import Mesh
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.parallel.mesh import make_mesh, shard_optimizer_state
    from recformer_tpu.parallel.pipeline import make_pipeline_pretrain_step
    from recformer_tpu.parallel.sequence import make_sp_pretrain_step
    from recformer_tpu.parallel.tensor import shard_params_tp, tp_config
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    devices = jax.devices()
    n = len(devices)
    kw = dict(max_token_num=64, item_seq_len=32, max_item_embeddings=6,
              attention_window=(16, 16), scan_layers=True)
    cfg = RecformerConfig.tiny(**kw)
    table = _synthetic_table(cfg, 64)
    B = batch_per_chip * max(n // 2, 1)
    rng_np = np.random.default_rng(0)
    ids = jnp.asarray(rng_np.integers(0, 64, size=(B, 8)).astype(np.int32))
    lens = jnp.asarray(rng_np.integers(2, 9, size=B).astype(np.int32))

    def build(cfg):
        model = RecformerForPretraining(cfg)
        icfg = (cfg.replace(attention_impl="chunked")
                if cfg.attention_impl == "sequence_parallel" else cfg)
        ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, ids, lens, icfg)
        params = RecformerForPretraining(icfg).init(jax.random.PRNGKey(0), ba, bb)
        return model, params

    half = n // 2
    modes = {}
    if n > 1:
        modes["dp"] = (cfg, make_mesh(), "plain")
        modes["dp_zero"] = (cfg, make_mesh(), "zero")
    if half >= 2:
        modes["tp"] = (tp_config(cfg), make_mesh(n_data=half, n_model=2), "tp")
        modes["pp"] = (cfg, Mesh(np.array(devices).reshape(half, 2),
                                 ("data", "pipe")), "pp")
        modes["sp"] = (cfg.replace(attention_impl="sequence_parallel",
                                   global_kv_mode="full"),
                       Mesh(np.array(devices).reshape(half, 2),
                            ("data", "seq")), "sp")
    out = {}
    for name, (mcfg, mesh, kind) in modes.items():
        model, params = build(mcfg)
        tx = create_optimizer(total_steps=100)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        if kind == "zero":
            state = shard_optimizer_state(state, mesh)
            step = make_pretrain_step(mcfg, model, mesh=mesh, zero=True)
        elif kind == "tp":
            state = state.replace(params=shard_params_tp(params, mesh))
            step = make_pretrain_step(mcfg, model, mesh=mesh, zero=True)
        elif kind == "pp":
            step = make_pipeline_pretrain_step(mcfg, model, mesh,
                                               num_microbatches=2)
        elif kind == "sp":
            step = make_sp_pretrain_step(mcfg, model, mesh)
        else:
            step = make_pretrain_step(mcfg, model, mesh=mesh)
        with mesh:
            st, m = step(state, jax.random.PRNGKey(1), table, ids, lens)
            jax.block_until_ready(m["loss"])  # compile + warm
            t0 = time.perf_counter()
            for i in range(steps):
                st, m = step(st, jax.random.PRNGKey(1), table, ids, lens)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / steps
        out[name] = {"step_ms": round(dt * 1e3, 1),
                     "loss": round(float(m["loss"]), 4),
                     "mesh": dict(mesh.shape)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--model", choices=["base", "tiny"], default="base")
    ap.add_argument("--per-mode", type=str, default=None, metavar="OUT_JSON",
                    help="also run the per-parallelism-mode functional table "
                         "and write it to this path")
    args = ap.parse_args()

    if args.per_mode:
        table = mode_table(args.batch_per_chip, args.steps)
        report = {"devices": jax.device_count(),
                  "platform": jax.devices()[0].platform, "modes": table}
        with open(args.per_mode, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
        return

    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.parallel.mesh import make_mesh

    cfg = (RecformerConfig.base if args.model == "base" else RecformerConfig.tiny)(
        attention_impl="pallas" if jax.devices()[0].platform == "tpu" else "chunked"
    )
    n = jax.device_count()
    single = throughput(None, cfg, args.batch_per_chip, args.steps)
    out = {"chips": n, "per_chip_1": round(single, 2)}
    if n > 1:
        full = throughput(make_mesh(), cfg, args.batch_per_chip, args.steps)
        out["per_chip_N"] = round(full, 2)
        out["scaling_efficiency"] = round(full / single, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
