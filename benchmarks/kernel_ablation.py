"""Ablation microbench for the flat-lane banded attention kernel: time
stripped-down variants to locate the non-MXU cost (the full kernel runs ~20x
over the MXU roofline; band-width sweeps are flat, so the cost is neither exp
volume nor the dots).

Usage: python benchmarks/kernel_ablation.py [--block-q 256]
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

from recformer_tpu.ops.attention import NEG_INF
from recformer_tpu.ops.pallas_attention import _band_iota_mask


def make_kernel(variant, block_q, window, nb, hpb, head_dim, num_globals):
    half = window // 2
    band = block_q + window

    def kern(q_ref, kpad_ref, vpad_ref, keyloc_ref, gk_ref, gv_ref, gvalid_ref,
             out_ref):
        in_dtype = q_ref.dtype
        g_ok = gvalid_ref[0, 0, :] != 0
        win_mask = _band_iota_mask(block_q, band, half)
        for i in range(nb):
            key_ok = keyloc_ref[0, pl.ds(i * block_q, band), 0] != 0
            loc_mask = win_mask & key_ok[None, :]
            for h in range(hpb):
                lo = h * head_dim
                q = q_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim]
                k_band = kpad_ref[0, pl.ds(i * block_q, band), lo:lo + head_dim]
                v_band = vpad_ref[0, pl.ds(i * block_q, band), lo:lo + head_dim]

                scores = jax.lax.dot_general(
                    q, k_band, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

                if variant == "dots_only":
                    e = scores
                elif variant == "no_softmax":
                    e = jnp.where(loc_mask, scores, NEG_INF)
                elif variant == "no_mask":
                    m = jnp.max(scores, axis=1, keepdims=True)
                    e = jnp.exp(scores - m)
                    e = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
                elif variant == "band_softmax":  # mask + softmax, no globals
                    s = jnp.where(loc_mask, scores, NEG_INF)
                    m = jnp.max(s, axis=1, keepdims=True)
                    e = jnp.exp(s - m)
                    e = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
                elif variant == "full":  # mask + softmax + global columns
                    gk = gk_ref[0, :, lo:lo + head_dim].astype(jnp.float32)
                    s = jnp.where(loc_mask, scores, NEG_INF)
                    gs = jax.lax.dot_general(
                        q.astype(jnp.float32), gk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gs = jnp.where(g_ok[None, :], gs, NEG_INF)
                    allp = jnp.concatenate([s, gs], axis=1)
                    m = jnp.max(allp, axis=1, keepdims=True)
                    e_all = jnp.exp(allp - m)
                    den = jnp.maximum(jnp.sum(e_all, axis=1, keepdims=True), 1e-30)
                    e = e_all[:, :band] / den
                else:
                    raise ValueError(variant)

                out = jax.lax.dot_general(
                    e.astype(in_dtype), v_band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim] = (
                    out.astype(out_ref.dtype))

    return kern


def run_variant(variant, q2, kpad, vpad, keyloc, gk, gv, gvalid, *, block_q,
                window, num_heads, num_globals, iters):
    B, L, HD = q2.shape
    D = HD // num_heads
    hpb = 128 // D
    HP = num_heads // hpb
    lane = hpb * D
    nb = L // block_q
    W = window
    blk = lambda b, hp: (b, 0, hp)
    row = lambda b, hp: (b, 0, 0)
    kern = make_kernel(variant, block_q, window, nb, hpb, D, num_globals)
    call = pl.pallas_call(
        kern,
        grid=(B, HP),
        in_specs=[
            pl.BlockSpec((1, L, lane), blk),
            pl.BlockSpec((1, L + W, lane), blk),
            pl.BlockSpec((1, L + W, lane), blk),
            pl.BlockSpec((1, L + W, 1), row),
            pl.BlockSpec((1, num_globals, lane), blk),
            pl.BlockSpec((1, num_globals, lane), blk),
            pl.BlockSpec((1, 1, num_globals), row),
        ],
        out_specs=pl.BlockSpec((1, L, lane), blk),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q2.dtype),
    )

    @jax.jit
    def run(q2, kpad, vpad, keyloc, gk, gv, gvalid):
        def body(c, _):
            o = call(q2 + c.astype(q2.dtype), kpad, vpad, keyloc, gk, gv, gvalid)
            return o.astype(jnp.float32).ravel()[0] * 1e-30, None

        final, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return final

    np.asarray(run(q2, kpad, vpad, keyloc, gk, gv, gvalid))
    t0 = time.perf_counter()
    np.asarray(run(q2, kpad, vpad, keyloc, gk, gv, gvalid))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--variants", type=str,
                    default="dots_only,no_softmax,no_mask,band_softmax,full")
    args = ap.parse_args()

    B, L, H, D, W, G = 16, 1024, 12, 64, 64, 1
    HD = H * D
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q2 = jax.random.normal(ks[0], (B, L, HD), jnp.bfloat16) * 0.5
    kpad = jnp.pad(jax.random.normal(ks[1], (B, L, HD), jnp.bfloat16) * 0.5,
                   ((0, 0), (W // 2, W // 2), (0, 0)))
    vpad = jnp.pad(jax.random.normal(ks[2], (B, L, HD), jnp.bfloat16) * 0.5,
                   ((0, 0), (W // 2, W // 2), (0, 0)))
    keyloc = jnp.pad(jnp.ones((B, L), jnp.int32), ((0, 0), (W // 2, W // 2)))[:, :, None]
    gk = q2[:, :G, :]
    gv = q2[:, :G, :]
    gvalid = jnp.ones((B, 1, G), jnp.int32)

    out = {"block_q": args.block_q}
    for v in args.variants.split(","):
        out[v + "_ms"] = run_variant(
            v, q2, kpad, vpad, keyloc, gk, gv, gvalid, block_q=args.block_q,
            window=W, num_heads=H, num_globals=G, iters=args.iters)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
