"""Thin (reassociated) global key/value path vs the materialized projections.

``global_rows_thin`` computes the global-row attention as
``hidden @ (W_kg^T q_g)`` / ``(probs @ hidden) @ W_vg`` instead of projecting
full-length ``k_g``/``v_g`` first — same math, reassociated (the two
projections and their backward collapse to N=heads thin GEMMs). These tests
pin value- and gradient-equality against the materialized ('full') path for
every attention implementation, including under attention-probs dropout
(the draw shape and rng are identical by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.models.recformer import RecformerModel
from recformer_tpu.ops.attention import (chunked_attention, dense_attention,
                                         global_rows_thin)
from recformer_tpu.ops.pallas_attention import pallas_window_attention

B, L, H, D = 2, 64, 2, 8
E = H * D
WINDOW = 8


def make_inputs(key):
    ks = jax.random.split(key, 10)
    shape = (B, L, H, D)
    q, k, v = (jax.random.normal(ks[i], shape, jnp.float32) for i in range(3))
    qg = jax.random.normal(ks[3], (B, 1, H, D), jnp.float32)
    hidden = jax.random.normal(ks[4], (B, L, E), jnp.float32)
    w_kg = jax.random.normal(ks[5], (E, E), jnp.float32) * 0.2
    b_kg = jax.random.normal(ks[6], (E,), jnp.float32) * 0.1
    w_vg = jax.random.normal(ks[7], (E, E), jnp.float32) * 0.2
    b_vg = jax.random.normal(ks[8], (E,), jnp.float32) * 0.1
    mask = np.ones((B, L), np.int32)
    mask[1, L - 17:] = 0
    mask[:, 0] = 2
    return q, k, v, qg, hidden, w_kg, b_kg, w_vg, b_vg, jnp.asarray(mask)


def materialize(hidden, w, b):
    return (hidden @ w + b).reshape(B, L, H, D)


def run_full(impl, q, k, v, qg, hidden, w_kg, b_kg, w_vg, b_vg, mask,
             dropout_rate=0.0, rng=None):
    k_g = materialize(hidden, w_kg, b_kg)
    v_g = materialize(hidden, w_vg, b_vg)
    return impl(q, k, v, qg, k_g, v_g, mask, WINDOW,
                dropout_rate=dropout_rate, dropout_rng=rng)


def run_thin(impl, q, k, v, qg, hidden, w_kg, b_kg, w_vg, b_vg, mask,
             dropout_rate=0.0, rng=None):
    rng_glb = jax.random.split(rng)[1] if dropout_rate > 0.0 else None
    g_out = global_rows_thin(hidden, qg, w_kg, b_kg, w_vg, b_vg, mask,
                             jnp.float32, 1, dropout_rate, rng_glb)
    return impl(q, k, v, qg, None, None, mask, WINDOW,
                dropout_rate=dropout_rate, dropout_rng=rng, g_out=g_out)


IMPLS = {
    "dense": dense_attention,
    "chunked": lambda *a, **kw: chunked_attention(*a, block=16, **kw),
    "pallas": lambda *a, **kw: pallas_window_attention(*a, block_q=16,
                                                       interpret=True, **kw),
}


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_thin_matches_full(impl):
    args = make_inputs(jax.random.PRNGKey(0))
    ref = run_full(IMPLS[impl], *args)
    out = run_thin(IMPLS[impl], *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_thin_matches_full_under_dropout(impl):
    """Same rng => bitwise-identical dropout draw => same outputs."""
    args = make_inputs(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(7)
    ref = run_full(IMPLS[impl], *args, dropout_rate=0.3, rng=rng)
    out = run_thin(IMPLS[impl], *args, dropout_rate=0.3, rng=rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_thin_gradients_match_full():
    q, k, v, qg, hidden, w_kg, b_kg, w_vg, b_vg, mask = make_inputs(
        jax.random.PRNGKey(2))
    cot = jax.random.normal(jax.random.PRNGKey(3), (B, L, H, D), jnp.float32)

    def loss_full(hidden, qg, w_kg, b_kg, w_vg, b_vg):
        out = run_full(dense_attention, q, k, v, qg, hidden,
                       w_kg, b_kg, w_vg, b_vg, mask)
        return jnp.sum(out * cot)

    def loss_thin(hidden, qg, w_kg, b_kg, w_vg, b_vg):
        out = run_thin(dense_attention, q, k, v, qg, hidden,
                       w_kg, b_kg, w_vg, b_vg, mask)
        return jnp.sum(out * cot)

    g_full = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4, 5))(
        hidden, qg, w_kg, b_kg, w_vg, b_vg)
    g_thin = jax.grad(loss_thin, argnums=(0, 1, 2, 3, 4, 5))(
        hidden, qg, w_kg, b_kg, w_vg, b_vg)
    for a, b in zip(g_full, g_thin):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def _tiny_cfg(**kw):
    return RecformerConfig.tiny(dtype="float32", hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0, **kw)


@pytest.fixture(scope="module")
def batch():
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab

    cfg = _tiny_cfg()
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    seqs = [
        [{"brand": f"b{i}", "color": "blue"} for i in range(5)],
        [{"brand": "solo"}],
    ]
    arrs = tok.batch_encode(seqs, pad_to_max=True)
    return {k: jnp.asarray(v) for k, v in arrs.items() if k != "word_begin"}


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_model_thin_matches_full_same_params(impl, batch):
    """The param tree is identical in both modes — one checkpoint, two modes."""
    m_full = RecformerModel(_tiny_cfg(attention_impl=impl, global_kv_mode="full"))
    m_thin = RecformerModel(_tiny_cfg(attention_impl=impl, global_kv_mode="thin"))
    params = m_full.init(jax.random.PRNGKey(0), **batch)
    p_thin = m_thin.init(jax.random.PRNGKey(0), **batch)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p_thin))
    _, pooled_full = m_full.apply(params, **batch)
    _, pooled_thin = m_thin.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(pooled_thin), np.asarray(pooled_full),
                               rtol=2e-4, atol=2e-4)
