"""Row-sharded item catalog: distributed scoring, exact ranks, and top-k.

The reference scores a ``(B, N)`` matrix against the full ``(N, H)`` item
table on ONE device (``/root/reference/recformer/models.py:539-545``) and
ranks on that matrix (``utils.py:92-107``). Here the catalog is row-sharded
across the ``model`` mesh axis:

- :func:`sharded_rank` — exact rank of the label without materializing the
  global score matrix: every shard counts scores strictly greater than the
  label's score, counts are ``psum``-ed. The label's own score is found on its
  owner shard and broadcast by sum (all other shards contribute 0).
- :func:`sharded_topk` — per-shard top-k, then all-gather of the k·n_shards
  candidates and a final top-k merge (exact for any k).

Both run inside ``shard_map`` so the communication pattern is explicit and
rides ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.heads import similarity_scores
from .mesh import MODEL_AXIS


def _l2norm(x, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def make_sharded_rank_fn(mesh: Mesh, temp: float):
    """Returns rank(pooled, item_emb_sharded, labels) -> (rank, valid_length).

    ``pooled``: (B, H) replicated across 'model'; ``item_emb``: (N, H) row
    sharded on 'model' (N divisible by axis size); ``labels``: (B,) global
    item ids, replicated."""

    def shard_fn(pooled, emb_shard, labels):
        # emb_shard: (N_local, H); global offset of this shard's rows
        idx = jax.lax.axis_index(MODEL_AXIS)
        n_local = emb_shard.shape[0]
        offset = idx * n_local

        scores = similarity_scores(pooled.astype(jnp.float32),
                                   emb_shard.astype(jnp.float32), temp)  # (B, N_local)

        local_label = labels - offset
        owns = (local_label >= 0) & (local_label < n_local)
        safe = jnp.clip(local_label, 0, n_local - 1)
        label_score_local = jnp.take_along_axis(scores, safe[:, None], axis=1)[:, 0]
        label_score = jax.lax.psum(
            jnp.where(owns, label_score_local, 0.0), MODEL_AXIS
        )  # (B,)

        greater = jnp.sum((scores > label_score[:, None]).astype(jnp.float32), axis=1)
        rank = jax.lax.psum(greater, MODEL_AXIS)
        valid = jnp.sum((scores > -1e4).astype(jnp.float32), axis=1)
        valid_length = jax.lax.psum(valid, MODEL_AXIS)
        return rank, valid_length

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)


def make_sharded_topk_fn(mesh: Mesh, temp: float, k: int):
    """Returns topk(pooled, item_emb_sharded) -> (scores (B,k), ids (B,k)),
    global item ids, exact."""

    def shard_fn(pooled, emb_shard):
        idx = jax.lax.axis_index(MODEL_AXIS)
        n_local = emb_shard.shape[0]
        offset = idx * n_local
        scores = similarity_scores(pooled.astype(jnp.float32),
                                   emb_shard.astype(jnp.float32), temp)
        # a shard may hold fewer than k rows; exactness only needs the global
        # candidate pool (n_shards * k_local) >= k
        k_local = min(k, n_local)
        local_scores, local_ids = jax.lax.top_k(scores, k_local)  # (B, k_local)
        local_ids = local_ids + offset
        all_scores = jax.lax.all_gather(local_scores, MODEL_AXIS, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(local_ids, MODEL_AXIS, axis=1, tiled=True)
        best_scores, pos = jax.lax.top_k(all_scores, k)
        best_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        return best_scores, best_ids

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated via all_gather+top_k merge
    )
    return jax.jit(fn)


def make_sharded_full_softmax_loss_fn(mesh: Mesh, temp: float):
    """Full-catalog CE with a row-sharded catalog: per-shard ``logsumexp``
    combined with a global max for stability; the label logit comes from its
    owner shard. Returns loss(pooled, emb_shard, labels) -> scalar."""

    def shard_fn(pooled, emb_shard, labels):
        idx = jax.lax.axis_index(MODEL_AXIS)
        n_local = emb_shard.shape[0]
        offset = idx * n_local
        logits = similarity_scores(pooled.astype(jnp.float32),
                                   emb_shard.astype(jnp.float32), temp)  # (B, N_local)
        local_max = jnp.max(logits, axis=1)
        # pmax has no autodiff rule; the max is only a stability shift whose
        # gradient contributions cancel in Z - label_logit, so stop_gradient
        # BEFORE the collective (after still fails — see parallel/sequence.py).
        global_max = jax.lax.pmax(jax.lax.stop_gradient(local_max), MODEL_AXIS)
        sumexp = jnp.sum(jnp.exp(logits - global_max[:, None]), axis=1)
        Z = jnp.log(jax.lax.psum(sumexp, MODEL_AXIS)) + global_max  # (B,)

        local_label = labels - offset
        owns = (local_label >= 0) & (local_label < n_local)
        safe = jnp.clip(local_label, 0, n_local - 1)
        label_logit = jax.lax.psum(
            jnp.where(owns, jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0], 0.0),
            MODEL_AXIS,
        )
        return jnp.mean(Z - label_logit)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    return fn
