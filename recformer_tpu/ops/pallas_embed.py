"""Fused 4-way embedding sum + LayerNorm Pallas kernel.

The Recformer embedding block sums four gathered embedding streams (word,
token-position, token-type, item-position) and LayerNorms the result
(reference ``/root/reference/recformer/models.py:108-138``). This kernel fuses
the adds and the normalization into one VMEM pass: the four ``(rows, H)``
blocks are read once, summed, normalized, scaled — a single HBM round-trip
instead of materializing the sum.

Backward (custom VJP) recomputes the normalized activations and produces the
shared input cotangent (identical for all four addends) plus reduced
dgamma/dbeta, accumulated across row-blocks by revisiting the same output
block over the inner grid dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_ROWS = 256


def _fwd_kernel(a_ref, b_ref, c_ref, d_ref, gamma_ref, beta_ref, out_ref, *, eps):
    x = (a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
         + c_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32))
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    y = xhat * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


def _bwd_kernel(a_ref, b_ref, c_ref, d_ref, gamma_ref, dout_ref,
                dx_ref, dgamma_ref, dbeta_ref, *, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    x = (a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
         + c_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32))
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv

    g = dout_ref[...].astype(jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)
    gg = g * gamma  # (rows, H)
    m1 = jnp.mean(gg, axis=-1, keepdims=True)
    m2 = jnp.mean(gg * xhat, axis=-1, keepdims=True)
    dx = inv * (gg - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dgamma_ref[...] += jnp.sum(g * xhat, axis=0, keepdims=True).astype(dgamma_ref.dtype)
    dbeta_ref[...] += jnp.sum(g, axis=0, keepdims=True).astype(dbeta_ref.dtype)


def _fwd_call(a2, b2, c2, d2, gamma, beta, *, eps, block_rows, interpret):
    N, H = a2.shape
    nb = N // block_rows
    kernel = functools.partial(_fwd_kernel, eps=eps)
    row_spec = pl.BlockSpec((block_rows, H), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, H), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[row_spec, row_spec, row_spec, row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((N, H), a2.dtype),
        interpret=interpret,
    )(a2, b2, c2, d2, gamma[None, :], beta[None, :])


def _bwd_call(a2, b2, c2, d2, gamma, dout, *, eps, block_rows, interpret):
    N, H = a2.shape
    nb = N // block_rows
    kernel = functools.partial(_bwd_kernel, eps=eps)
    row_spec = pl.BlockSpec((block_rows, H), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, H), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[row_spec, row_spec, row_spec, row_spec, vec_spec, row_spec],
        out_specs=(row_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=interpret,
    )(a2, b2, c2, d2, gamma[None, :], dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_core(a2, b2, c2, d2, gamma, beta, eps, block_rows, interpret):
    return _fwd_call(a2, b2, c2, d2, gamma, beta, eps=eps, block_rows=block_rows,
                     interpret=interpret)


def _fused_fwd(a2, b2, c2, d2, gamma, beta, eps, block_rows, interpret):
    out = _fwd_call(a2, b2, c2, d2, gamma, beta, eps=eps, block_rows=block_rows,
                    interpret=interpret)
    return out, (a2, b2, c2, d2, gamma)


def _fused_bwd(eps, block_rows, interpret, res, dout):
    a2, b2, c2, d2, gamma = res
    dx, dgamma, dbeta = _bwd_call(a2, b2, c2, d2, gamma, dout.astype(jnp.float32),
                                  eps=eps, block_rows=block_rows, interpret=interpret)
    dx = dx.astype(a2.dtype)
    return dx, dx, dx, dx, dgamma[0].astype(gamma.dtype), dbeta[0].astype(gamma.dtype)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_embed_layernorm(
    word_e: jnp.ndarray,  # (B, L, H)
    pos_e: jnp.ndarray,
    type_e: jnp.ndarray,
    item_e: jnp.ndarray,
    gamma: jnp.ndarray,  # (H,)
    beta: jnp.ndarray,
    eps: float = 1e-5,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, H = word_e.shape
    N = B * L
    br = min(block_rows, N)
    while N % br:
        br //= 2
    flat = [x.reshape(N, H) for x in (word_e, pos_e, type_e, item_e)]
    out = _fused_core(*flat, gamma, beta, eps, br, interpret)
    return out.reshape(B, L, H)
