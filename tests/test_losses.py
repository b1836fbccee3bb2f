"""Loss-function unit tests against hand-computed references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.training import losses


def softmax_ce(logits, label):
    logits = np.asarray(logits, np.float64)
    z = logits - logits.max()
    logp = z - np.log(np.exp(z).sum())
    return -logp[label]


def test_info_nce_diagonal():
    rng = np.random.default_rng(0)
    z1 = rng.standard_normal((4, 8)).astype(np.float32)
    z2 = rng.standard_normal((4, 8)).astype(np.float32)
    temp = 0.05
    loss, correct, total = losses.info_nce_loss(jnp.asarray(z1), jnp.asarray(z2), temp)

    n1 = z1 / np.linalg.norm(z1, axis=1, keepdims=True)
    n2 = z2 / np.linalg.norm(z2, axis=1, keepdims=True)
    sim = n1 @ n2.T / temp
    expect = np.mean([softmax_ce(sim[i], i) for i in range(4)])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
    assert float(total) == 4
    assert 0 <= float(correct) <= 4


def test_mlm_loss_ignore_index():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 5)), jnp.float32)
    labels = jnp.asarray([[1, -100, 4], [-100, -100, 0]])
    loss = losses.mlm_loss(logits, labels)
    l = np.asarray(logits, np.float64)
    expect = np.mean([softmax_ce(l[0, 0], 1), softmax_ce(l[0, 2], 4), softmax_ce(l[1, 2], 0)])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_mlm_loss_all_ignored_is_zero():
    logits = jnp.ones((1, 2, 5))
    labels = jnp.full((1, 2), -100)
    assert float(losses.mlm_loss(logits, labels)) == 0.0


def test_seqrec_full_softmax():
    rng = np.random.default_rng(2)
    pooled = rng.standard_normal((3, 8)).astype(np.float32)
    table = rng.standard_normal((7, 8)).astype(np.float32)
    labels = np.asarray([2, 0, 6])
    temp = 0.05
    loss = losses.seqrec_full_softmax_loss(jnp.asarray(pooled), jnp.asarray(table),
                                           jnp.asarray(labels), temp)
    p = pooled / np.linalg.norm(pooled, axis=1, keepdims=True)
    e = table / np.linalg.norm(table, axis=1, keepdims=True)
    sim = p @ e.T / temp
    expect = np.mean([softmax_ce(sim[i], labels[i]) for i in range(3)])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_seqrec_sampled_softmax_label_at_zero():
    """Label sits at candidate index 0 (reference models.py:594-597)."""
    rng = np.random.default_rng(3)
    pooled = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    labels = jnp.asarray([1, 5, 7, 19])
    loss = losses.seqrec_sampled_softmax_loss(pooled, table, labels, 0.05, 6,
                                              jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_bce_pos_weight():
    logits = jnp.asarray([0.5, -1.0])
    labels = jnp.asarray([1.0, 0.0])
    pw = 3.0
    loss = losses.bce_with_logits_loss(logits, labels, pw)
    expect = np.mean([pw * np.log1p(np.exp(-0.5)), np.log1p(np.exp(-1.0))])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)


def test_focal_loss_matches_reference_formula():
    """models.py:611-631: ce * alpha_t * (1-p_t)^gamma, mean-reduced."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal(6).astype(np.float32)
    y = (rng.random(6) < 0.5).astype(np.float32)
    alpha, gamma = 0.6, 2.0
    got = losses.focal_loss(jnp.asarray(x), jnp.asarray(y), alpha, gamma)
    p = 1 / (1 + np.exp(-x))
    ce = -(y * np.log(p) + (1 - y) * np.log(1 - p))
    p_t = p * y + (1 - p) * (1 - y)
    a_t = alpha * y + (1 - alpha) * (1 - y)
    expect = np.mean(a_t * (1 - p_t) ** gamma * ce)
    np.testing.assert_allclose(float(got), expect, rtol=1e-4)


def test_gather_embeddings_modes_single_device():
    z = jnp.ones((2, 4))
    assert losses.gather_embeddings(z, None) is z
