"""Numerics: chunked (sliding-window XLA) attention vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.ops.attention import chunked_attention, dense_attention


def make_inputs(key, B=2, L=64, H=2, D=8, n_pad=(0, 17), global_at_zero=True):
    ks = jax.random.split(key, 7)
    shape = (B, L, H, D)
    q, k, v, qg, kg, vg = (jax.random.normal(ks[i], shape, jnp.float32) for i in range(6))
    mask = np.ones((B, L), np.int32)
    for b, p in enumerate(n_pad[:B]):
        if p:
            mask[b, L - p :] = 0
    if global_at_zero:
        mask[:, 0] = 2
    return q, k, v, qg, kg, vg, jnp.asarray(mask)


@pytest.mark.parametrize("window", [8, 16])
@pytest.mark.parametrize("block", [16, 32])
def test_chunked_matches_dense(window, block):
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(0))
    ref = dense_attention(q, k, v, qg, kg, vg, mask, window)
    out = chunked_attention(q, k, v, qg, kg, vg, mask, window, block=block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_matches_dense_no_globals():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(1), global_at_zero=False)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 8)
    out = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_padding_tokens_produce_zero_output():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(2), n_pad=(5, 9))
    out = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16)
    out = np.asarray(out)
    m = np.asarray(mask)
    assert np.all(out[m == 0] == 0)


def test_padding_content_does_not_leak():
    """Changing K/V at padded positions must not change any valid output."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(3), n_pad=(10, 20))
    out1 = chunked_attention(q, k, v, qg, kg, vg, mask, 16, block=16)
    pad = (np.asarray(mask) == 0)[:, :, None, None]
    k2 = jnp.where(pad, 1e3, k)
    v2 = jnp.where(pad, -1e3, v)
    out2 = chunked_attention(q, k2, v2, qg, kg, vg, mask, 16, block=16)
    valid = ~pad[:, :, 0, 0]
    np.testing.assert_allclose(
        np.asarray(out1)[valid], np.asarray(out2)[valid], rtol=1e-5, atol=1e-5
    )


def test_global_token_sees_everything():
    """Moving content far from position 0 must still affect the CLS row."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(4), n_pad=(0, 0))
    out1 = dense_attention(q, k, v, qg, kg, vg, mask, 8)
    kg2 = kg.at[:, -1].add(3.0)
    out2 = dense_attention(q, k, v, qg, kg2, vg, mask, 8)
    # CLS (global) row changed even though position -1 is far outside its window
    assert not np.allclose(np.asarray(out1)[:, 0], np.asarray(out2)[:, 0])
    # chunked implementation agrees
    c2 = chunked_attention(q, k, v, qg, kg2, vg, mask, 8, block=16)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(out2), rtol=2e-5, atol=2e-5)


def test_local_window_is_respected():
    """A local token must NOT be affected by far-away local content."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(5), n_pad=(0, 0))
    window = 8
    out1 = chunked_attention(q, k, v, qg, kg, vg, mask, window, block=16)
    # perturb K/V at position 40; check outputs at positions < 40 - w/2 (and >0,
    # excluding the global CLS whose row sees everything)
    k2 = k.at[:, 40].add(5.0)
    v2 = v.at[:, 40].add(5.0)
    out2 = chunked_attention(q, k2, v2, qg, kg, vg, mask, window, block=16)
    a, b = np.asarray(out1), np.asarray(out2)
    np.testing.assert_allclose(a[:, 1:35], b[:, 1:35], rtol=1e-5, atol=1e-5)
    assert not np.allclose(a[:, 38:43], b[:, 38:43])


def test_gradients_flow():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(6))

    def loss(q, k, v):
        return jnp.sum(chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).sum() > 0


# ---------------------------------------------------------------------------
# attention-probs dropout (HF attention_probs_dropout_prob semantics)
# ---------------------------------------------------------------------------

def test_dropout_deterministic_per_key_and_off_by_default():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(7))
    clean = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16)
    rng = jax.random.PRNGKey(1)
    d1 = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16,
                           dropout_rate=0.5, dropout_rng=rng)
    d2 = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16,
                           dropout_rate=0.5, dropout_rng=rng)
    d3 = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16,
                           dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(d3))
    assert not np.allclose(np.asarray(d1), np.asarray(clean))
    # the global CLS row is dropped too (separate rng branch)
    assert not np.allclose(np.asarray(d1)[:, 0], np.asarray(clean)[:, 0])


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_dropout_is_unbiased(impl):
    """Inverted dropout: E over keys of the dropped output == clean output."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(8), L=32, n_pad=(0, 5))
    fn = dense_attention if impl == "dense" else (
        lambda *a, **kw: chunked_attention(*a, block=16, **kw))
    clean = np.asarray(fn(q, k, v, qg, kg, vg, mask, 8))

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    outs = jax.vmap(
        lambda r: fn(q, k, v, qg, kg, vg, mask, 8, dropout_rate=0.3,
                     dropout_rng=r)
    )(keys)
    mean = np.asarray(jnp.mean(outs, axis=0))
    # padding rows stay exactly zero under dropout
    np.testing.assert_array_equal(mean[1, -5:], 0.0)
    np.testing.assert_allclose(mean, clean, atol=0.15)


def test_dropout_grads_flow():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(9))
    rng = jax.random.PRNGKey(3)

    def loss(q, k, v):
        out = chunked_attention(q, k, v, qg, kg, vg, mask, 8, block=16,
                                dropout_rate=0.5, dropout_rng=rng)
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).sum() > 0
