"""GEMM roofline probe for the encoder's exact matmul shapes.

The step profile (docs/PERF.md) attributes ~49% of step time to matmul
fusions at ~46% MXU utilization. This bench answers whether that is
headroom or hardware reality: it times bare ``dot_general``s at the shapes
the encoder actually issues (fused dual-tower seq rows M = 2B*L = 32768)
and reports achieved TFLOP/s vs the chip's bf16 peak.

Methodology (two pitfalls measured the hard way):
- the GEMM output is consumed by a full ``sum()`` — consuming a single
  element lets XLA fold the whole GEMM into one row x column dot; the sum
  fuses into the GEMM epilogue so it adds no HBM pass;
- per-iteration time is the SLOPE between a short and a 3x-longer
  ``lax.scan`` of the same body — one remote dispatch through the axon
  relay costs ~25 ms, which would swamp any absolute single-call timing.

Usage: python benchmarks/gemm_roofline.py [--iters 30] [--peak-tflops 197]
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


def _timed_call(fn, *args):
    np.asarray(fn(*args))  # warm (compile)
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def bench_gemm(a_shape, b_shape, contract, iters, dtype=jnp.bfloat16):
    """ms per GEMM via the slope of a short vs 3x scan; returns (ms, flops)."""
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = (jax.random.normal(ka, a_shape, jnp.float32) * 0.02).astype(dtype)
    b = (jax.random.normal(kb, b_shape, jnp.float32) * 0.02).astype(dtype)
    dims = ((contract), ((), ()))

    def make(length):
        @jax.jit
        def run(a, b):
            def body(c, _):
                a_eff = a + c.astype(a.dtype)  # carry dep: no hoisting
                out = jax.lax.dot_general(a_eff, b, dims,
                                          preferred_element_type=jnp.float32)
                return out.sum() * 1e-30, None  # full consume: no dot DCE

            final, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                    length=length)
            return final

        return run

    t_short = _timed_call(make(iters), a, b)
    t_long = _timed_call(make(3 * iters), a, b)
    ms = max((t_long - t_short) / (2 * iters), 1e-6)

    m = a_shape[0] if contract[0] == (1,) else a_shape[1]
    k = a_shape[contract[0][0]]
    n = b_shape[1] if contract[1] == (0,) else b_shape[0]
    flops = 2.0 * m * k * n
    return ms, t_short, t_long, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak (v5e: 197)")
    ap.add_argument("--m", type=int, default=32768,
                    help="GEMM rows (fused dual-tower: 2B*L = 2*16*1024)")
    args = ap.parse_args()

    M = args.m
    # (name, a_shape, b_shape, contraction dims (a_dims, b_dims))
    cases = [
        # forward projections / FFN at encoder shapes
        ("proj_768x768", (M, 768), (768, 768), ((1,), (0,))),
        ("ffn_up_768x3072", (M, 768), (768, 3072), ((1,), (0,))),
        ("ffn_down_3072x768", (M, 3072), (3072, 768), ((1,), (0,))),
        # backward dW: contract over the M axis
        ("dW_768_768", (M, 768), (M, 768), ((0,), (0,))),
        ("dW_768_3072", (M, 768), (M, 3072), ((0,), (0,))),
        # machine-capability reference points
        ("square_4096", (4096, 4096), (4096, 4096), ((1,), (0,))),
        ("square_8192", (8192, 8192), (8192, 8192), ((1,), (0,))),
    ]
    rows = []
    for name, a_s, b_s, contract in cases:
        ms, t_s, t_l, flops = bench_gemm(a_s, b_s, contract, args.iters)
        tflops = flops / (ms * 1e-3) / 1e12
        util = tflops / args.peak_tflops
        rows.append({"name": name, "ms": round(ms, 4),
                     "t_short_ms": round(t_s, 2), "t_long_ms": round(t_l, 2),
                     "tflops": round(tflops, 1), "mxu_util": round(util, 3)})
        print(f"{name:20s} {ms:8.4f} ms  {tflops:7.1f} TFLOP/s "
              f"({100 * util:5.1f}% of peak)  [calls {t_s:.1f} / {t_l:.1f} ms]")
    print(json.dumps({"device": str(jax.devices()[0]),
                      "peak_tflops": args.peak_tflops, "m": M, "rows": rows}))


if __name__ == "__main__":
    main()
