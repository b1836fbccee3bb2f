"""Sequence-parallel (context-parallel) attention vs the dense oracle.

Shards the sequence dim over an 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8) and checks the halo-exchange +
distributed-global-softmax op reproduces single-device windowed+global
attention exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from recformer_tpu.ops.attention import dense_attention
from recformer_tpu.parallel.sequence import (
    SEQ_AXIS,
    make_sequence_parallel_attention,
    sequence_parallel_attention,
)


def make_inputs(key, B=2, L=256, H=2, D=8, n_pad=(0, 37)):
    ks = jax.random.split(key, 6)
    shape = (B, L, H, D)
    q, k, v, qg, kg, vg = (jax.random.normal(ks[i], shape, jnp.float32) * 0.5
                           for i in range(6))
    mask = np.ones((B, L), np.int32)
    for b, p in enumerate(n_pad[:B]):
        if p:
            mask[b, L - p:] = 0
    mask[:, 0] = 2  # CLS global (shard 0)
    return q, k, v, qg, kg, vg, jnp.asarray(mask)


def seq_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), (SEQ_AXIS,))


@pytest.mark.parametrize("window", [16, 32])
def test_matches_dense_oracle(window):
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(0))
    ref = dense_attention(q, k, v, qg, kg, vg, mask, window)
    mesh = seq_mesh()
    fn = make_sequence_parallel_attention(mesh, window)
    out = fn(q, k, v, qg, kg, vg, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_window_spans_multiple_shards():
    """window/2 == shard length: the halo is an entire neighbour shard."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(1), L=256)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 64)
    mesh = seq_mesh()
    fn = make_sequence_parallel_attention(mesh, 64)
    out = fn(q, k, v, qg, kg, vg, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_single_shard_degenerates():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(2), L=128)
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 16)
    mesh = Mesh(np.array(jax.devices()[:1]), (SEQ_AXIS,))
    fn = make_sequence_parallel_attention(mesh, 16)
    out = fn(q, k, v, qg, kg, vg, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_dense():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(3))
    mesh = seq_mesh()
    fn = make_sequence_parallel_attention(mesh, 16)

    def loss_sp(q, k, v, kg, vg):
        return jnp.sum(fn(q, k, v, qg, kg, vg, mask) ** 2)

    def loss_ref(q, k, v, kg, vg):
        return jnp.sum(dense_attention(q, k, v, qg, kg, vg, mask, 16) ** 2)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4))(q, k, v, kg, vg)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, kg, vg)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_global_row_distributed_softmax_exact():
    """The CLS row's output merges per-shard partial softmaxes; compare the
    CLS row specifically (it exercises pmax/psum, not the halo path)."""
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(4))
    ref = dense_attention(q, k, v, qg, kg, vg, mask, 16)
    mesh = seq_mesh()
    out = make_sequence_parallel_attention(mesh, 16)(q, k, v, qg, kg, vg, mask)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(ref)[:, 0],
                               rtol=2e-5, atol=2e-5)
    # and padding rows are exactly zero
    np.testing.assert_array_equal(np.asarray(out)[1, -37:], 0.0)


def test_dropout_unbiased_and_deterministic():
    q, k, v, qg, kg, vg, mask = make_inputs(jax.random.PRNGKey(5), L=128)
    mesh = seq_mesh()
    from jax.sharding import PartitionSpec as P
    import functools

    spec = P(None, SEQ_AXIS)
    body = functools.partial(sequence_parallel_attention, window=16,
                             dropout_rate=0.3)
    mapped = jax.jit(jax.shard_map(
        lambda r, *a: body(*a, dropout_rng=r),
        mesh=mesh, in_specs=(P(),) + (spec,) * 7, out_specs=spec,
        check_vma=False,
    ))
    clean = make_sequence_parallel_attention(mesh, 16)(q, k, v, qg, kg, vg, mask)
    r = jax.random.PRNGKey(7)
    d1 = mapped(r, q, k, v, qg, kg, vg, mask)
    d2 = mapped(r, q, k, v, qg, kg, vg, mask)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(clean))
    keys = jax.random.split(jax.random.PRNGKey(0), 192)
    mean = np.mean(np.stack([np.asarray(mapped(kk, q, k, v, qg, kg, vg, mask))
                             for kk in keys[:64]]), axis=0)
    np.testing.assert_allclose(mean, np.asarray(clean), atol=0.15)


def test_full_model_forward_sequence_parallel():
    """Whole backbone (embeddings -> encoder -> pooler) with the token dim
    sharded over 8 devices matches the single-device dense model."""
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab
    from recformer_tpu.models.recformer import RecformerModel
    from recformer_tpu.parallel.sequence import make_sequence_parallel_forward

    cfg_sp = RecformerConfig.tiny(attention_impl="sequence_parallel",
                                  hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0,
                                  dtype="float32")
    cfg_ref = cfg_sp.replace(attention_impl="dense")

    tok = RecformerTokenizer(cfg_sp, SimpleVocab(vocab_size=cfg_sp.vocab_size))
    seqs = [
        [{"brand": f"b{i}", "color": "blue green red"} for i in range(7)],
        [{"brand": "solo", "size": "tiny"}],
    ]
    arrs = tok.batch_encode(seqs, pad_to_max=True)
    batch = {k: jnp.asarray(v) for k, v in arrs.items() if k != "word_begin"}

    ref_model = RecformerModel(cfg_ref)
    params = ref_model.init(jax.random.PRNGKey(0), **batch)
    hidden_ref, pooled_ref = ref_model.apply(params, **batch)

    mesh = seq_mesh()
    sp_model = RecformerModel(cfg_sp)
    run = make_sequence_parallel_forward(sp_model, mesh)
    hidden_sp, pooled_sp = run(params, batch)

    np.testing.assert_allclose(np.asarray(hidden_sp), np.asarray(hidden_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled_sp), np.asarray(pooled_ref),
                               rtol=2e-4, atol=2e-4)


def test_full_model_training_mode_runs_sharded():
    """Train-mode forward (both dropouts active) executes under the sharded
    wrapper and is deterministic per rng key."""
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab
    from recformer_tpu.models.recformer import RecformerModel
    from recformer_tpu.parallel.sequence import make_sequence_parallel_forward

    cfg = RecformerConfig.tiny(attention_impl="sequence_parallel",
                               dtype="float32")
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    arrs = tok.batch_encode(
        [[{"brand": "x", "color": "y z"} for _ in range(4)]], pad_to_max=True)
    batch = {k: jnp.asarray(v) for k, v in arrs.items() if k != "word_begin"}

    model = RecformerModel(cfg)
    # init must run a non-sharded impl (same param tree; the SP op needs the
    # shard_map axis which init doesn't have)
    params = RecformerModel(cfg.replace(attention_impl="dense")).init(
        jax.random.PRNGKey(0), **batch)
    run = make_sequence_parallel_forward(model, seq_mesh())
    _, p_eval = run(params, batch)
    _, p1 = run(params, batch, rng=jax.random.PRNGKey(1), deterministic=False)
    _, p2 = run(params, batch, rng=jax.random.PRNGKey(1), deterministic=False)
    _, p3 = run(params, batch, rng=jax.random.PRNGKey(2), deterministic=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert not np.allclose(np.asarray(p1), np.asarray(p3))
    assert not np.allclose(np.asarray(p1), np.asarray(p_eval))


def test_sp_pretrain_step_matches_single_device():
    """The full SP training step (dual tower + MLM, grads through the halo
    shard_map) == the plain jit step at dropout 0."""
    import optax

    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.parallel.sequence import make_sp_pretrain_step
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    kw = dict(
        max_token_num=64, item_seq_len=32, max_item_embeddings=6,
        attention_window=(16, 16), hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, dtype="float32")
    cfg_ref = RecformerConfig.tiny(attention_impl="chunked", **kw)
    cfg_sp = RecformerConfig.tiny(attention_impl="sequence_parallel",
                                  global_kv_mode="full", **kw)
    import __graft_entry__ as ge

    table = ge._synthetic_table(cfg_ref, 12)
    rng = np.random.default_rng(0)
    B = 8
    item_ids = jnp.asarray(rng.integers(0, 12, size=(B, 6)).astype(np.int32))
    seq_lens = jnp.asarray(rng.integers(2, 7, size=B).astype(np.int32))
    model_ref = RecformerForPretraining(cfg_ref)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids,
                                 seq_lens, cfg_ref)
    params = model_ref.init(jax.random.PRNGKey(0), ba, bb)
    # SGD: Adam's m/sqrt(v) amplifies reduction-order noise (see PP test)
    tx = optax.sgd(1e-2)

    s_ref = TrainState.create(apply_fn=model_ref.apply, params=params, tx=tx)
    single = make_pretrain_step(cfg_ref, model_ref)
    s_ref, m_ref = single(s_ref, jax.random.PRNGKey(1), table, item_ids,
                          seq_lens)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))
    model_sp = RecformerForPretraining(cfg_sp)
    s_sp = TrainState.create(apply_fn=model_sp.apply, params=params, tx=tx)
    step = make_sp_pretrain_step(cfg_sp, model_sp, mesh)
    s_sp, m_sp = step(s_sp, jax.random.PRNGKey(1), table, item_ids, seq_lens)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sp["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sp_pretrain_step_trains_with_dropout():
    """SP trains with reference dropout-rate semantics: per-shard streams,
    finite loss, rng-sensitive."""
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.parallel.sequence import make_sp_pretrain_step
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState
    import __graft_entry__ as ge

    cfg = RecformerConfig.tiny(
        attention_impl="sequence_parallel", global_kv_mode="full",
        max_token_num=64, item_seq_len=32, max_item_embeddings=6,
        attention_window=(16, 16), hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, dtype="float32")
    table = ge._synthetic_table(cfg, 12)
    rng = np.random.default_rng(0)
    B = 4
    item_ids = jnp.asarray(rng.integers(0, 12, size=(B, 6)).astype(np.int32))
    seq_lens = jnp.asarray(rng.integers(2, 7, size=B).astype(np.int32))
    model = RecformerForPretraining(cfg)
    from recformer_tpu.data.device_pipeline import make_pretrain_batch

    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids,
                                 seq_lens, cfg.replace(attention_impl="chunked"))
    params = RecformerForPretraining(
        cfg.replace(attention_impl="chunked")).init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=0, total_steps=10)
    mesh = Mesh(np.array(jax.devices()[:2]), ("seq",))
    step = make_sp_pretrain_step(cfg, model, mesh)

    s1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    s1, m1 = step(s1, jax.random.PRNGKey(1), table, item_ids, seq_lens)
    assert np.isfinite(float(m1["loss"]))
    s2 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    s2, m2 = step(s2, jax.random.PRNGKey(2), table, item_ids, seq_lens)
    assert float(m1["loss"]) != float(m2["loss"])
