"""Probe: head-pair block-diagonal band dots vs per-head 64-lane slices.

The production kernel's data-movement floor (~0.8 ms/call, ~8x the MXU
roofline) is per-head (bq, 64) lane slices out of 128-lane vregs. This probe
measures the alternative: load full (rows, 128) vregs and compute BOTH heads'
scores in one full-width dot against a block-diagonal (2*band, 128) operand
(cross-head terms vanish against the zero blocks), then contract the
(bq, 2*band) exponentials with a block-diagonal V to land head0 in lanes
0:64 and head1 in lanes 64:128 of a single (bq, 128) store.

Cost model: the pair form doubles the MXU MACs (contraction 128 with half
zeros, 2x columns) but eliminates every 64-lane slice/store. Whether it wins
is exactly the question — the ablation says the floor is moves, not math.

Usage: python benchmarks/headpair_probe.py [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from recformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def make_kernel(variant, block_q, window, nb, head_dim, L):
    half = window // 2
    band = min(block_q + window, L)

    def offs(i):
        off = min(max(i * block_q - half, 0), L - band)
        return off

    def perhead(q_ref, k_ref, v_ref, out_ref):
        in_dtype = q_ref.dtype
        for i in range(nb):
            off = offs(i)
            for h in range(2):
                lo = h * head_dim
                q = q_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim]
                k = k_ref[0, pl.ds(off, band), lo:lo + head_dim]
                v = v_ref[0, pl.ds(off, band), lo:lo + head_dim]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o = jax.lax.dot_general(s.astype(in_dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                out_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim] = (
                    o.astype(out_ref.dtype))

    def pair(q_ref, k_ref, v_ref, out_ref):
        in_dtype = q_ref.dtype
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (band, 2 * head_dim), 1)
        lo_mask = lane128 < head_dim
        for i in range(nb):
            off = offs(i)
            qp = q_ref[0, pl.ds(i * block_q, block_q), :]   # (bq, 128)
            kp = k_ref[0, pl.ds(off, band), :]              # (band, 128)
            vp = v_ref[0, pl.ds(off, band), :]
            zero = jnp.zeros((), in_dtype)
            kbd = jnp.concatenate([jnp.where(lo_mask, kp, zero),
                                   jnp.where(lo_mask, zero, kp)], axis=0)
            vbd = jnp.concatenate([jnp.where(lo_mask, vp, zero),
                                   jnp.where(lo_mask, zero, vp)], axis=0)
            s = jax.lax.dot_general(qp, kbd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(s.astype(in_dtype), vbd,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out_ref[0, pl.ds(i * block_q, block_q), :] = o.astype(out_ref.dtype)

    return perhead if variant == "perhead" else pair


def run_variant(variant, B, L, HP, block_q, window, iters):
    nb = L // block_q
    lane = 128
    D = 64
    kern = make_kernel(variant, block_q, window, nb, D, L)
    blk = lambda b, hp: (b, 0, hp)
    call = pl.pallas_call(
        kern,
        grid=(B, HP),
        in_specs=[pl.BlockSpec((1, L, lane), blk)] * 3,
        out_specs=pl.BlockSpec((1, L, lane), blk),
        out_shape=jax.ShapeDtypeStruct((B, L, HP * lane), jnp.bfloat16),
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(ks[i], (B, L, HP * lane), jnp.bfloat16) * 0.3
               for i in range(3))

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            out = call(q + c.astype(q.dtype), k, v)
            return out.astype(jnp.float32).ravel()[0] * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c

    np.asarray(run(q, k, v))
    t0 = time.perf_counter()
    np.asarray(run(q, k, v))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block-q", type=int, default=256)
    args = ap.parse_args()
    B, L, HP, W = 16, 1024, 6, 64  # 12 heads = 6 pairs
    out = {"shapes": f"B{B} L{L} pairs{HP} W{W} block{args.block_q}"}
    for variant in ("perhead", "pair"):
        out[variant + "_ms"] = run_variant(variant, B, L, HP, args.block_q,
                                           W, args.iters)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
