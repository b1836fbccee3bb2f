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


def test_fused_embed_layernorm_matches_reference():
    from recformer_tpu.ops.pallas_embed import fused_embed_layernorm

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    B, L, H = 2, 32, 16
    a, b, c, d = (jax.random.normal(ks[i], (B, L, H), jnp.float32) for i in range(4))
    gamma = jax.random.normal(ks[4], (H,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[5], (H,)) * 0.1
    eps = 1e-5

    out = fused_embed_layernorm(a, b, c, d, gamma, beta, eps=eps, interpret=INTERPRET)
    x = a + b + c + d
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(np.asarray(var) + eps) * gamma + beta
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_embed_layernorm_gradients():
    from recformer_tpu.ops.pallas_embed import fused_embed_layernorm

    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 6)
    B, L, H = 2, 16, 8
    a, b, c, d = (jax.random.normal(ks[i], (B, L, H), jnp.float32) for i in range(4))
    gamma = jax.random.normal(ks[4], (H,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[5], (H,)) * 0.1

    def loss_fused(a, b, c, d, gamma, beta):
        o = fused_embed_layernorm(a, b, c, d, gamma, beta, interpret=INTERPRET)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(a, b, c, d, gamma, beta):
        x = a + b + c + d
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        o = (x - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return jnp.sum(o * jnp.sin(o))

    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(a, b, c, d, gamma, beta)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(a, b, c, d, gamma, beta)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_backbone_with_pallas_embed_matches_xla():
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.models.recformer import RecformerModel

    if INTERPRET:
        cfgp = RecformerConfig.tiny(embed_ln_impl="xla", dtype="float32",
                                    hidden_dropout_prob=0.0)
        # interpret-mode flag isn't plumbed through the model; compare the
        # xla path against itself on CPU and rely on the kernel tests above.
        # On TPU this test runs the real fused kernel.
        cfg2 = cfgp
    else:
        cfgp = RecformerConfig.tiny(embed_ln_impl="pallas", dtype="float32",
                                    hidden_dropout_prob=0.0)
        cfg2 = cfgp.replace(embed_ln_impl="xla")
    model_a = RecformerModel(cfg2)
    model_b = RecformerModel(cfgp)
    B, L = 2, cfg2.max_token_num
    batch = {
        k: jnp.zeros((B, L), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    batch["attention_mask"] = batch["attention_mask"].at[:, :40].set(1)
    batch["global_attention_mask"] = batch["global_attention_mask"].at[:, 0].set(1)
    params = model_a.init(jax.random.PRNGKey(0), **batch)
    h1, p1 = model_a.apply(params, **batch)
    h2, p2 = model_b.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-4)


def test_pallas_item_tower_shape():
    """L=32, window=16 (band == L+W) — the item-tower case where one query
    block covers the whole row."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(7), L=32, n_pad=(0, 9))
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 16)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, 16, block_q=32,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_window_larger_than_block():
    """window > block_q: band wider than 2 blocks."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(8), L=64)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 32)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, 32, block_q=16,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,D", [(3, 8), (12, 8), (2, 128), (1, 16)])
def test_pallas_head_packing_fallbacks(H, D):
    """The flat-lane kernel packs 128//D heads per lane block when that
    divides H, else falls back to the full lane dimension; every branch must
    match the oracle."""
    from recformer_tpu.ops.pallas_attention import _heads_per_block

    hpb = _heads_per_block(H, D)
    assert H % hpb == 0
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(7), H=H, D=D)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 16)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, 16, block_q=32,
                                  interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_head_packing_gradients_odd_heads():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(8), H=3, D=8)

    def loss_p(*a):
        return jnp.sum(pallas_window_attention(*a, mask, 16, block_q=32,
                                               interpret=INTERPRET) ** 2)

    def loss_c(*a):
        return jnp.sum(chunked_attention(*a, mask, 16, block=32) ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(6)))(q, k, v, qg, kg, vg)
    gc = jax.grad(loss_c, argnums=tuple(range(6)))(q, k, v, qg, kg, vg)
    for a, b in zip(gp, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_interpret_dropout_falls_back_to_chunked():
    """The interpret backend has no TPU PRNG; with dropout active the wrapper
    must route to the XLA chunked implementation (same-math, same rng)."""
    import math

    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(11))
    L = q.shape[1]
    rng = jax.random.PRNGKey(5)
    out = pallas_window_attention(q, k, v, qg, kg, vg, mask, 8, block_q=16,
                                  interpret=True, dropout_rate=0.4,
                                  dropout_rng=rng)
    ref = chunked_attention(q, k, v, qg, kg, vg, mask, 8,
                            block=math.gcd(L, 128), dropout_rate=0.4,
                            dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dropout_requires_rng():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(12))
    with pytest.raises(ValueError, match="dropout_rng"):
        pallas_window_attention(q, k, v, qg, kg, vg, mask, 8, block_q=16,
                                interpret=True, dropout_rate=0.1)


def test_extra_global_rows_demoted_to_local():
    """Out-of-contract masks with >max_globals global rows are normalized at
    the wrapper (extras demoted to local), so the fused epilogue and the
    legacy scattered path agree instead of silently diverging."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(13))
    bad = np.asarray(mask).copy()
    bad[:, 5] = 2  # second global row, out of contract
    bad = jnp.asarray(bad)
    norm = np.asarray(mask).copy()  # only the first global kept
    out = pallas_window_attention(q, k, v, qg, kg, vg, bad, 8, block_q=16,
                                  max_globals=1, interpret=INTERPRET)
    ref = dense_attention(q, k, v, qg, kg, vg, jnp.asarray(norm), 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
