"""Loss functions for all three task heads.

References into ``/root/reference/recformer/models.py``:
- in-batch InfoNCE with cross-device gathered negatives: ``:471-497``
- MLM cross-entropy with -100 ignore labels: ``:499-510``
- seq-rec full-softmax / sampled-softmax: ``:587-597``
- fraud BCE-with-logits + pos_weight, FocalLoss: ``:601-631, 701-708``

All losses compute in float32 regardless of the model compute dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.heads import similarity_scores

IGNORE_INDEX = -100


def _l2norm(x, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def gather_embeddings(z: jnp.ndarray, axis_name: Optional[str], grad_mode: str = "full"):
    """All-gather pooled embeddings across the data axis.

    ``grad_mode='full'``: JAX's ``all_gather`` is natively differentiable
    (its transpose is a ``psum_scatter``) — gradients flow to every shard.
    ``grad_mode='local'`` reproduces the reference's stop-gradient-on-remote
    semantics (``models.py:475-490``): the gathered copy is stop-gradded and
    the local shard's rows are substituted back with gradients attached.
    """
    if axis_name is None:
        return z
    if grad_mode == "full":
        return jax.lax.all_gather(z, axis_name, axis=0, tiled=True)
    gathered = jax.lax.stop_gradient(jax.lax.all_gather(z, axis_name, axis=0, tiled=True))
    idx = jax.lax.axis_index(axis_name)
    B = z.shape[0]
    return jax.lax.dynamic_update_slice_in_dim(gathered, z, idx * B, axis=0)


def info_nce_loss(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    temp: float,
    axis_name: Optional[str] = None,
    grad_mode: str = "full",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """In-batch contrastive loss with diagonal labels.

    Returns (loss, correct_count, total_count) where counts are per-shard
    (the reference accumulates them for its contrastive-accuracy metric,
    ``models.py:497,515-516``).
    """
    z1g = gather_embeddings(z1.astype(jnp.float32), axis_name, grad_mode)
    z2g = gather_embeddings(z2.astype(jnp.float32), axis_name, grad_mode)
    sim = jnp.einsum("ih,jh->ij", _l2norm(z1g), _l2norm(z2g)) / temp  # (N, N)
    labels = jnp.arange(sim.shape[0])
    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    correct = jnp.sum(jnp.argmax(sim, axis=1) == labels).astype(jnp.float32)
    total = jnp.array(sim.shape[0], jnp.float32)
    return loss, correct, total


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Masked-LM CE at gathered positions. ``labels == IGNORE_INDEX`` slots
    are excluded; mean over valid slots (torch CrossEntropyLoss(ignore_index)
    semantics)."""
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logits = logits.astype(jnp.float32)
    # logsumexp-gather form: log_softmax would materialize a second
    # (B, P, vocab) fp32 tensor just to gather one column per row (the
    # ~1.35 ms/tower fusions in the step profile); gather(log_softmax) ==
    # gather(logits) - logsumexp(logits) exactly.
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def seqrec_full_softmax_loss(pooled, item_embeddings, labels, temp: float) -> jnp.ndarray:
    """CE over the full catalog (``models.py:589-591``)."""
    logits = similarity_scores(pooled.astype(jnp.float32), item_embeddings.astype(jnp.float32), temp)
    # logsumexp-gather form (see mlm_loss): no second (B, catalog) logp tensor
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return jnp.mean(lse - picked)


def seqrec_sampled_softmax_loss(
    pooled, item_embeddings, labels, temp: float, num_negatives: int, rng: jax.Array
) -> jnp.ndarray:
    """Sampled softmax: label at index 0 + uniform negatives. Negatives are
    drawn uniformly over the catalog and MAY collide with the label — a
    deliberate reference-parity choice (``models.py:594``)."""
    B = labels.shape[0]
    num_items = item_embeddings.shape[0]
    negatives = jax.random.randint(rng, (B, num_negatives), 0, num_items)
    candidates = jnp.concatenate([labels[:, None], negatives], axis=-1)  # (B, 1+n)
    cand_emb = item_embeddings[candidates].astype(jnp.float32)
    logits = similarity_scores(pooled.astype(jnp.float32), cand_emb, temp)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])


def bce_with_logits_loss(logits, labels, pos_weight: float = 1.0) -> jnp.ndarray:
    """``BCEWithLogitsLoss(pos_weight)`` (``models.py:705-708``)."""
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    per = pos_weight * y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
    return jnp.mean(per)


def focal_loss(logits, labels, alpha: float = 1.0, gamma: float = 2.0,
               pos_weight: Optional[float] = None) -> jnp.ndarray:
    """Focal loss, reference ``models.py:601-631`` (defined there but BCE is
    what the fraud head actually uses)."""
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    pw = 1.0 if pos_weight is None else pos_weight
    ce = pw * y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
    p = jax.nn.sigmoid(x)
    p_t = p * y + (1.0 - p) * (1.0 - y)
    w = (1.0 - p_t) ** gamma
    if alpha is not None:
        a_t = alpha * y + (1.0 - alpha) * (1.0 - y)
        w = a_t * w
    return jnp.mean(w * ce)
