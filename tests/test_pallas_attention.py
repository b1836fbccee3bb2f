"""Pallas fused attention vs the dense oracle (interpret mode on CPU; the
same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.ops.attention import chunked_attention, dense_attention
from recformer_tpu.ops.pallas_attention import pallas_window_attention

INTERPRET = jax.devices()[0].platform != "tpu"


def make_inputs(key, B=2, L=64, H=2, D=8, n_pad=(0, 17), global_at_zero=True):
    ks = jax.random.split(key, 6)
    shape = (B, L, H, D)
    q, k, v, qg, kg, vg = (jax.random.normal(ks[i % 6], shape, jnp.float32) * 0.5
                           for i in range(6))
    mask = np.ones((B, L), np.int32)
    for b, p in enumerate(n_pad[:B]):
        if p:
            mask[b, L - p :] = 0
    if global_at_zero:
        mask[:, 0] = 2
    return q, k, v, qg, kg, vg, jnp.asarray(mask)


@pytest.mark.parametrize("window", [8, 16])
@pytest.mark.parametrize("block_q", [16, 32])
def test_pallas_matches_dense(window, block_q):
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(0))
    ref = dense_attention(q, k, v, qg, kg, vg, mask, window)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, window,
                                  block_q=block_q, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_no_globals():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(1), global_at_zero=False)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 8)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, 8, block_q=16,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_gradients_match_chunked():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(2), n_pad=(3, 11))

    def loss_pallas(q, k, v, qg, kg, vg):
        o = pallas_window_attention(q, k, v, qg, kg, vg, mask, 8, block_q=16,
                                    interpret=INTERPRET)
        return jnp.sum(o * jnp.cos(o))

    def loss_chunked(q, k, v, qg, kg, vg):
        o = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, qg, kg, vg)
    g2 = jax.grad(loss_chunked, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, qg, kg, vg)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
