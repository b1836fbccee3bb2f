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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--model", choices=["base", "tiny"], default="base")
    args = ap.parse_args()

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
