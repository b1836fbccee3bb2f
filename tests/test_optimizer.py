"""Optimizer parity: LR schedule formula, no-decay grouping."""

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.training.optimizer import (
    create_optimizer,
    decay_mask,
    linear_warmup_linear_decay,
)


def test_schedule_matches_reference_formula():
    """reference optimization.py:12-17: warmup step/warmup, then
    max(0, 1 - step/total) — decay anchored at 0, not warmup end."""
    lr, warmup, total = 5e-5, 100, 1000
    sched = linear_warmup_linear_decay(lr, warmup, total)
    for step in (0, 1, 50, 99, 100, 101, 500, 999, 1000, 1500):
        if step < warmup:
            expected = lr * step / warmup
        else:
            expected = lr * max(0.0, 1 - step / total)
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), expected,
                                   rtol=1e-4, atol=1e-12)


def test_decay_mask_excludes_bias_and_layernorm():
    params = {
        "dense": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
        "LayerNorm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "emb": {"embedding": np.zeros((4, 2))},
    }
    mask = decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["LayerNorm"]["scale"] is False
    assert mask["LayerNorm"]["bias"] is False
    assert mask["emb"]["embedding"] is True


def test_grad_accum_multisteps():
    """k micro-steps with accumulation == 1 step on the averaged gradient."""
    import optax

    params = {"w": jnp.ones(3)}
    tx_plain = create_optimizer(learning_rate=1e-2, warmup_steps=1, total_steps=100)
    tx_accum = create_optimizer(learning_rate=1e-2, warmup_steps=1, total_steps=100,
                                grad_accum_steps=2)
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0])}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    s = tx_plain.init(params)
    u, s = tx_plain.update(g_mean, s, params)
    p_plain = optax.apply_updates(params, u)

    s2 = tx_accum.init(params)
    ua, s2 = tx_accum.update(g1, s2, params)
    pa = optax.apply_updates(params, ua)  # no-op micro step
    ub, s2 = tx_accum.update(g2, s2, pa)
    p_accum = optax.apply_updates(pa, ub)

    np.testing.assert_allclose(np.asarray(p_plain["w"]), np.asarray(p_accum["w"]),
                               rtol=1e-6)


def test_head_lr_two_group_recipe():
    """head_lr splits params by top-level module: 'longformer' subtree steps
    at learning_rate, everything else (fc1/fc2/fc3 head) at head_lr. The
    encoder group must match the single-LR optimizer bit-for-bit, and the
    head group must match a single-LR optimizer run at head_lr (clip is
    inactive on these tiny grads so global-vs-group clipping cannot differ)."""
    import optax

    params = {
        "longformer": {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)}},
        "fc1": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
        "fc3": {"kernel": jnp.ones((2, 1)), "bias": jnp.zeros(1)},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), params)
    kw = dict(warmup_steps=0, total_steps=100)  # step 0 is already past warmup

    def one_update(tx):
        s = tx.init(params)
        u, _ = tx.update(grads, s, params)
        return optax.apply_updates(params, u)

    p_split = one_update(create_optimizer(learning_rate=5e-5, head_lr=1e-3, **kw))
    p_enc = one_update(create_optimizer(learning_rate=5e-5, **kw))
    p_head = one_update(create_optimizer(learning_rate=1e-3, **kw))

    np.testing.assert_array_equal(
        np.asarray(p_split["longformer"]["dense"]["kernel"]),
        np.asarray(p_enc["longformer"]["dense"]["kernel"]))
    for k in ("fc1", "fc3"):
        np.testing.assert_array_equal(np.asarray(p_split[k]["kernel"]),
                                      np.asarray(p_head[k]["kernel"]))
    # the two groups really moved at different rates
    d_enc = float(jnp.abs(p_split["longformer"]["dense"]["kernel"] - 1.0).max())
    d_head = float(jnp.abs(p_split["fc1"]["kernel"] - 1.0).max())
    assert d_head > 5 * d_enc


def test_head_lr_labels_wrapped_variables_tree():
    """The real TrainState.params is the full flax variables dict with a
    top-level 'params' key (init_model_params returns model.init output), so
    the backbone key is NOT at path[0]. Regression test for the round-3 bug
    where every leaf was labeled 'head' and --head_lr silently trained the
    entire model (encoder included) at head_lr."""
    from recformer_tpu.training.optimizer import head_label_fn

    wrapped = {
        "params": {
            "longformer": {"dense": {"kernel": jnp.ones((2, 2))}},
            "fc1": {"kernel": jnp.ones((2, 2))},
        }
    }
    labels = head_label_fn(wrapped)
    assert labels["params"]["longformer"]["dense"]["kernel"] == "encoder"
    assert labels["params"]["fc1"]["kernel"] == "head"
    # bare tree still labels correctly
    bare = wrapped["params"]
    labels_bare = head_label_fn(bare)
    assert labels_bare["longformer"]["dense"]["kernel"] == "encoder"
    assert labels_bare["fc1"]["kernel"] == "head"
