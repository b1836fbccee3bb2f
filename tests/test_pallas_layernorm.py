"""ln_impl='pallas_bwd' (jnp forward / Pallas backward LayerNorm) parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.ops.pallas_layernorm import pallas_layernorm


def _ref_ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + eps)) * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("shape", [(4, 32, 64), (1, 8, 128)])
def test_pallas_layernorm_value_and_grads(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2.0
    scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    eps = 1e-5

    out = pallas_layernorm(x, scale, bias, eps, True)
    ref = _ref_ln(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def loss_p(x, s, b):
        return jnp.sum(jnp.sin(pallas_layernorm(x, s, b, eps, True)))

    def loss_r(x, s, b):
        return jnp.sum(jnp.sin(_ref_ln(x, s, b, eps)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["pallas_bwd", "split_bwd"])
def test_model_ln_impl_parity(impl):
    """Full tiny model: ln_impl variant == 'xla' values and grads."""
    from __graft_entry__ import _synthetic_table
    from recformer_tpu.data.device_pipeline import assemble_for_config
    from recformer_tpu.models.recformer import RecformerModel

    base = dict(max_token_num=32, item_seq_len=16, max_item_embeddings=4,
                attention_window=(8, 8), hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0, dtype="float32",
                attention_impl="chunked")
    cfg_x = RecformerConfig.tiny(**base)
    cfg_p = RecformerConfig.tiny(ln_impl=impl, **base)
    table = _synthetic_table(cfg_x, 12)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 12, size=(4, 6)).astype(np.int32))
    lens = jnp.asarray(rng.integers(2, 7, size=4).astype(np.int32))
    batch = assemble_for_config(table, ids, lens, cfg_x)
    batch = {k: batch[k] for k in ("input_ids", "attention_mask",
                                   "global_attention_mask", "token_type_ids",
                                   "item_position_ids")}
    mx, mp = RecformerModel(cfg_x), RecformerModel(cfg_p)
    params = mx.init(jax.random.PRNGKey(0), **batch)
    # identical param trees: the pallas variant reuses the same scale/bias names
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(mp.init(jax.random.PRNGKey(0), **batch)))

    def loss(m):
        def f(p):
            _, pooled = m.apply(p, **batch)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)
        return f

    lx, gx = jax.value_and_grad(loss(mx))(params), None
    lp = jax.value_and_grad(loss(mp))(params)
    np.testing.assert_allclose(float(lx[0]), float(lp[0]), rtol=1e-5)
    # flax LN uses the fast-variance form (E[x^2] - mu^2); the pallas-bwd
    # forward uses two-pass variance — fp32-reassociation-level differences
    for a, b in zip(jax.tree.leaves(lx[1]), jax.tree.leaves(lp[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1.5e-4)


def test_ln_impl_validation():
    with pytest.raises(ValueError):
        RecformerConfig.tiny(ln_impl="nope")


@pytest.mark.parametrize("shape", [(4, 32, 64), (3, 200, 64)])
def test_split_layernorm_value_and_grads(shape):
    """ln_impl='split_bwd': jnp backward with the dgamma/dbeta barrier must
    be numerically identical to the reference LN (same math, only fusion
    boundaries differ)."""
    from recformer_tpu.ops.pallas_layernorm import split_layernorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2.0
    scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    eps = 1e-5

    out = split_layernorm(x, scale, bias, eps)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_ln(x, scale, bias, eps)),
                               rtol=1e-5, atol=1e-5)

    def loss_s(x, s, b):
        return jnp.sum(jnp.sin(split_layernorm(x, s, b, eps)))

    def loss_r(x, s, b):
        return jnp.sum(jnp.sin(_ref_ln(x, s, b, eps)))

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_bwd_odd_row_count_keeps_block_bounded():
    """An M not divisible by DEFAULT_BLOCK_ROWS must pick the largest divisor
    <= the default block, not collapse to one whole-input program."""
    from recformer_tpu.ops import pallas_layernorm as mod

    rng = np.random.default_rng(1)
    # M = 3 * 200 = 600: largest divisor <= 512 is 300
    x = jnp.asarray(rng.standard_normal((3, 200, 64)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    eps = 1e-5

    def loss_p(x, s, b):
        return jnp.sum(jnp.sin(pallas_layernorm(x, s, b, eps, True)))

    def loss_r(x, s, b):
        return jnp.sum(jnp.sin(_ref_ln(x, s, b, eps)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)
