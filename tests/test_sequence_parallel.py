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
