"""Pipeline-parallel encoder tests on the 8-device virtual CPU mesh.

The GPipe shard_map schedule must be *functionally invisible*: same hidden
states, pooled outputs, and parameter gradients as the single-device
scan_layers forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from __graft_entry__ import _synthetic_table
from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.device_pipeline import assemble_for_config
from recformer_tpu.models.recformer import RecformerModel
from recformer_tpu.parallel.pipeline import make_pipeline_forward


def _setup(num_layers=4, B=8):
    cfg = RecformerConfig.tiny(
        num_hidden_layers=num_layers,
        attention_window=(8,) * num_layers,
        max_token_num=32, item_seq_len=16, max_item_embeddings=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype="float32", attention_impl="chunked", scan_layers=True,
    )
    table = _synthetic_table(cfg, 12)
    rng = np.random.default_rng(0)
    item_ids = jnp.asarray(rng.integers(0, 12, size=(B, 6)).astype(np.int32))
    seq_lens = jnp.asarray(rng.integers(2, 7, size=B).astype(np.int32))
    batch = assemble_for_config(table, item_ids, seq_lens, cfg)
    batch = {k: batch[k] for k in ("input_ids", "attention_mask",
                                   "global_attention_mask", "token_type_ids",
                                   "item_position_ids")}
    model = RecformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)
    return cfg, model, params, batch


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 2), (2, 1)])
def test_pipeline_forward_matches_single_device(stages, microbatches):
    cfg, model, params, batch = _setup()
    mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
    run = make_pipeline_forward(model, mesh, microbatches)
    hidden_pp, pooled_pp = run(params, batch)
    hidden_ref, pooled_ref = model.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(hidden_pp), np.asarray(hidden_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_pp), np.asarray(pooled_ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_single_device():
    """jax.grad through the ppermute schedule == single-device grads (the
    reverse pipeline comes from autodiff, no hand-written backward)."""
    cfg, model, params, batch = _setup()
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    run = make_pipeline_forward(model, mesh, 4)

    def loss_pp(p):
        _, pooled = run(p, batch)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    def loss_ref(p):
        _, pooled = model.apply(p, **batch)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_pp, tree_pp = jax.tree_util.tree_flatten(g_pp)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(g_ref)
    assert tree_pp == tree_ref
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_validates_config():
    cfg, model, params, batch = _setup()
    mesh = Mesh(np.array(jax.devices()[:3]), ("pipe",))
    with pytest.raises(ValueError):
        make_pipeline_forward(model, mesh, 2)  # 4 layers % 3 stages
    model_noscan = RecformerModel(cfg.replace(scan_layers=False))
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    with pytest.raises(ValueError):
        make_pipeline_forward(model_noscan, mesh2, 2)


def _pretrain_setup(num_layers=4, B=8, **cfg_kw):
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining

    kw = dict(
        num_hidden_layers=num_layers,
        attention_window=(8,) * num_layers,
        max_token_num=32, item_seq_len=16, max_item_embeddings=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype="float32", attention_impl="chunked", scan_layers=True,
    )
    kw.update(cfg_kw)
    cfg = RecformerConfig.tiny(**kw)
    table = _synthetic_table(cfg, 12)
    rng = np.random.default_rng(0)
    item_ids = jnp.asarray(rng.integers(0, 12, size=(B, 6)).astype(np.int32))
    seq_lens = jnp.asarray(rng.integers(2, 7, size=B).astype(np.int32))
    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids,
                                 seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    return cfg, model, params, table, item_ids, seq_lens


def test_pipeline_pretrain_step_matches_single_device():
    """The full PP training step (dual tower + MLM, grads through ppermute)
    == the plain jit step at dropout 0."""
    from recformer_tpu.parallel.pipeline import make_pipeline_pretrain_step
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    cfg, model, params, table, item_ids, seq_lens = _pretrain_setup()
    # SGD for the parity check: params diff == lr * grads diff. Adam's
    # m/sqrt(v) turns near-zero-grad fp32 reduction-order noise into
    # sign-level differences, which is not what this test measures.
    import optax

    tx = optax.sgd(1e-2)

    s_ref = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    single = make_pretrain_step(cfg, model)
    s_ref, m_ref = single(s_ref, jax.random.PRNGKey(1), table, item_ids, seq_lens)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "pipe"))
    s_pp = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pipeline_pretrain_step(cfg, model, mesh, num_microbatches=2)
    s_pp, m_pp = step(s_pp, jax.random.PRNGKey(1), table, item_ids, seq_lens)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_pretrain_step_trains_with_dropout():
    """PP can train with reference dropout semantics: per-(layer, microbatch)
    streams give a finite loss, updated params, and rng-dependent results."""
    from recformer_tpu.parallel.pipeline import make_pipeline_pretrain_step
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState

    cfg, model, params, table, item_ids, seq_lens = _pretrain_setup(
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=0, total_steps=10)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    step = make_pipeline_pretrain_step(cfg, model, mesh, num_microbatches=2)

    s1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    s1, m1 = step(s1, jax.random.PRNGKey(1), table, item_ids, seq_lens)
    assert np.isfinite(float(m1["loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(s1.params)))
    assert changed

    s2 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    s2, m2 = step(s2, jax.random.PRNGKey(2), table, item_ids, seq_lens)
    # different rng -> different dropout masks -> different loss
    assert float(m1["loss"]) != float(m2["loss"])
