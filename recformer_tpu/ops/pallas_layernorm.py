"""LayerNorm with a fused Pallas BACKWARD kernel.

Profile finding (docs/PERF.md, benchmarks/profile_step.py): XLA fuses each
LayerNorm backward into the preceding GEMM's epilogue, turning a 0.20 ms bare
GEMM into a ~0.95 ms ``multiply_reduce_fusion`` (dgamma/dbeta cross-row sums
+ two per-row stats + the dx chain, all serialized into the GEMM's write
path). This module keeps the FORWARD as plain jnp — XLA still fuses it for
free into whatever produces the input — and routes only the backward through
one Pallas kernel that computes dx, dgamma, dbeta in a single pass over the
(M, H) activations (fp32 stats recomputed in-kernel; the cross-program
dgamma/dbeta accumulate in a shared output block revisited by every grid
step, which is safe because TPU grid steps run sequentially).

Wire-in is behind ``config.ln_impl`` ("xla" keeps nn.LayerNorm; "pallas_bwd"
uses this). Parameter tree is identical (scale/bias under the same module
name).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 512


def _ln_forward_math(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_bwd_kernel(x_ref, g_ref, dout_ref, dx_ref, dgamma_ref, dbeta_ref,
                   *, eps: float):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    x = x_ref[0].astype(jnp.float32)          # (bm, H)
    dy = dout_ref[0].astype(jnp.float32)
    gamma = g_ref[0].astype(jnp.float32)      # (1, H)

    H = x.shape[-1]
    mu = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / H)
    xc = x - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * (1.0 / H)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dyg = dy * gamma
    m1 = jnp.sum(dyg, axis=-1, keepdims=True) * (1.0 / H)
    m2 = jnp.sum(dyg * xhat, axis=-1, keepdims=True) * (1.0 / H)
    dx = rstd * (dyg - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dgamma_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)[None]
    dbeta_ref[...] += jnp.sum(dy, axis=0, keepdims=True)[None]


def _ln_bwd_call(x2, scale, dout2, eps, interpret):
    M, H = x2.shape
    bm = min(DEFAULT_BLOCK_ROWS, M)
    if M % bm:
        # largest divisor of M <= DEFAULT_BLOCK_ROWS, so an odd M never
        # collapses to a single whole-input program (VMEM budget)
        bm = next(b for b in range(bm, 0, -1) if M % b == 0)
    grid = (M // bm,)
    kernel = functools.partial(_ln_bwd_kernel, eps=eps)
    acc = lambda i: (0, 0, 0)
    dx, dgamma, dbeta = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, H), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 1, H), acc),
            pl.BlockSpec((1, bm, H), lambda i: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bm, H), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 1, H), acc),   # shared block: sequential RMW
            pl.BlockSpec((1, 1, H), acc),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, M, H), x2.dtype),
            jax.ShapeDtypeStruct((1, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, H), jnp.float32),
        ),
        interpret=interpret,
    )(x2[None], scale[None, None], dout2[None])
    return dx[0], dgamma[0, 0], dbeta[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_layernorm(x, scale, bias, eps, interpret=False):
    """LayerNorm: jnp forward (XLA-fusible), fused Pallas backward."""
    return _ln_forward_math(x, scale, bias, eps)


def _pln_fwd(x, scale, bias, eps, interpret):
    return _ln_forward_math(x, scale, bias, eps), (x, scale)


def _pln_bwd(eps, interpret, res, dout):
    x, scale = res
    shape = x.shape
    H = shape[-1]
    x2 = x.reshape(-1, H)
    dout2 = dout.reshape(-1, H).astype(x.dtype)
    dx, dgamma, dbeta = _ln_bwd_call(x2, scale.astype(x.dtype), dout2,
                                     eps, interpret)
    return (dx.reshape(shape).astype(x.dtype), dgamma.astype(scale.dtype),
            dbeta.astype(scale.dtype))


pallas_layernorm.defvjp(_pln_fwd, _pln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def split_layernorm(x, scale, bias, eps):
    """LayerNorm with a SPLIT XLA backward (``ln_impl='split_bwd'``).

    Perf probe for the documented GEMM-epilogue headroom (docs/PERF.md: ~12
    LN-backward-fused GEMMs at 0.95 ms vs 0.20 bare; the whole-grad Pallas
    move was a wash): keep the row-local dx chain as plain jnp — XLA may
    still fuse it into the dW GEMM that consumes it, those are per-row lane
    reductions — but cut the CROSS-ROW dgamma/dbeta reductions out of that
    fusion with an optimization_barrier on their inputs, so the serializing
    (M,)-axis sums run as their own small read-bound kernel instead of
    inside the GEMM's write path."""
    return _ln_forward_math(x, scale, bias, eps)


def _sln_fwd(x, scale, bias, eps):
    return _ln_forward_math(x, scale, bias, eps), (x, scale)


def _sln_bwd(eps, res, dout):
    x, scale = res
    x32 = x.astype(jnp.float32)
    dy = dout.astype(jnp.float32)
    H = x.shape[-1]
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dyg = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dyg - m1 - xhat * m2)).astype(x.dtype)

    # barrier severs the param-grad reductions from the dx/GEMM fusion
    dy_b, xhat_b = jax.lax.optimization_barrier((dy, xhat))
    red_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dy_b * xhat_b, axis=red_axes).astype(scale.dtype)
    dbeta = jnp.sum(dy_b, axis=red_axes).astype(scale.dtype)
    return dx, dgamma, dbeta


split_layernorm.defvjp(_sln_fwd, _sln_bwd)
