"""Honest attention-kernel microbenchmark (device->host barrier).

Compares chunked-XLA vs Pallas windowed attention, fwd and fwd+bwd, at
Recformer-base shapes, using a scan of N calls and host materialization (see
docs/PERF.md on why block_until_ready is not a barrier here).

Usage: python benchmarks/attention_micro.py [--iters 50] [--bh 192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from recformer_tpu.ops.attention import chunked_attention
from recformer_tpu.ops.pallas_attention import pallas_window_attention


def timed_scan(fn, iters, *args):
    """Each iteration's first operand is perturbed by the previous output so
    the body is NOT loop-invariant (XLA would hoist an invariant body out of
    the scan and the measurement would be fiction)."""

    @jax.jit
    def run(*a):
        def body(c, _):
            first = a[0] + c.astype(a[0].dtype)
            out = fn(first, *a[1:])
            return out.astype(jnp.float32).ravel()[0] * 1e-30, None

        final_c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return final_c

    np.asarray(run(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms per call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--L", type=int, default=1024)
    ap.add_argument("--H", type=int, default=12)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--block-q", type=int, default=128)
    args = ap.parse_args()

    B, L, H, D, W = args.B, args.L, args.H, args.D, args.window
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q, k, v, qg, kg, vg = (jax.random.normal(ks[i], (B, L, H, D), jnp.bfloat16) * 0.5
                           for i in range(6))
    mask = np.ones((B, L), np.int32)
    mask[:, 0] = 2
    mask[B // 2 :, -128:] = 0
    mask = jnp.asarray(mask)

    out = {"block_q": args.block_q}
    out["pallas_fwd_ms"] = timed_scan(
        lambda q, k, v: pallas_window_attention(q, k, v, qg, kg, vg, mask, W,
                                                block_q=args.block_q),
        args.iters, q, k, v)
    out["chunked_fwd_ms"] = timed_scan(
        lambda q, k, v: chunked_attention(q, k, v, qg, kg, vg, mask, W),
        args.iters, q, k, v)

    def grad_of(fn):
        g = jax.grad(lambda q, k, v: fn(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                        v.astype(jnp.bfloat16)).astype(jnp.float32).sum(),
                     argnums=(0, 1, 2))

        def call(q, k, v):
            dq, dk, dv = g(q, k, v)
            return dq + dk + dv

        return call

    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    out["pallas_fwdbwd_ms"] = timed_scan(
        grad_of(lambda q, k, v: pallas_window_attention(q, k, v, qg, kg, vg, mask, W,
                                                        block_q=args.block_q)),
        args.iters, qf, kf, vf)
    out["chunked_fwdbwd_ms"] = timed_scan(
        grad_of(lambda q, k, v: chunked_attention(q, k, v, qg, kg, vg, mask, W)),
        args.iters, qf, kf, vf)

    out["shapes"] = f"B{B} L{L} H{H} D{D} W{W}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
