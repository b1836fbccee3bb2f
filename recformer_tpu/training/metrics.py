"""Ranking metrics and streaming averages.

Reference: ``/root/reference/utils.py:19-108``. The :func:`rank_metrics`
function computes NDCG@k / Recall(HR)@k / MRR / AUC from a rank derived as the
count of strictly-greater scores — exactly the reference ``Ranker.forward``
(``utils.py:92-107``), but fully on device and batchable under ``jit``.
``valid_length`` counts scores above the ``-MAX_VAL`` sentinel used to mask
candidates (``utils.py:5,94``).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

MAX_VAL = 1e4


def rank_from_scores(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = #{j : scores[i, j] > scores[i, labels[i]]} (0 = top-1)."""
    predicted = jnp.take_along_axis(scores, labels[:, None], axis=1)  # (B, 1)
    return jnp.sum((predicted < scores).astype(jnp.float32), axis=-1)


def rank_metrics(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    ks: Sequence[int] = (10, 50),
) -> Dict[str, jnp.ndarray]:
    """Per-batch mean metrics. ``scores``: (B, N) float; ``labels``: (B,) int."""
    scores = scores.astype(jnp.float32)
    rank = rank_from_scores(scores, labels)
    valid_length = jnp.sum((scores > -MAX_VAL).astype(jnp.float32), axis=-1)
    out: Dict[str, jnp.ndarray] = {}
    for k in ks:
        indicator = (rank < k).astype(jnp.float32)
        out[f"NDCG@{k}"] = jnp.mean(indicator / jnp.log2(rank + 2.0))
        out[f"Recall@{k}"] = jnp.mean(indicator)
    out["MRR"] = jnp.mean(1.0 / (rank + 1.0))
    out["AUC"] = jnp.mean(1.0 - rank / jnp.maximum(valid_length, 1.0))
    # CE loss over the candidate set (reference returns it alongside metrics)
    logp = jax.nn.log_softmax(scores, axis=-1)
    out["loss"] = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    return out


def rank_metrics_from_rank(
    rank: jnp.ndarray, valid_length: jnp.ndarray, ks: Sequence[int] = (10, 50)
) -> Dict[str, jnp.ndarray]:
    """Same metrics when the (global) rank is already known — used by the
    sharded full-catalog evaluator where per-shard greater-counts are psummed
    instead of materializing the full score matrix on one device."""
    out: Dict[str, jnp.ndarray] = {}
    for k in ks:
        indicator = (rank < k).astype(jnp.float32)
        out[f"NDCG@{k}"] = jnp.mean(indicator / jnp.log2(rank + 2.0))
        out[f"Recall@{k}"] = jnp.mean(indicator)
    out["MRR"] = jnp.mean(1.0 / (rank + 1.0))
    out["AUC"] = jnp.mean(1.0 - rank / jnp.maximum(valid_length, 1.0))
    return out


class AverageMeterSet:
    """Streaming named averages (host side), reference ``utils.py:43-73``."""

    def __init__(self):
        self._sum: Dict[str, float] = {}
        self._count: Dict[str, int] = {}
        self._val: Dict[str, float] = {}

    def update(self, name: str, value: float, n: int = 1) -> None:
        self._sum[name] = self._sum.get(name, 0.0) + float(value) * n
        self._count[name] = self._count.get(name, 0) + n
        self._val[name] = float(value)

    def update_dict(self, metrics: Dict[str, jnp.ndarray], n: int = 1) -> None:
        for k, v in metrics.items():
            self.update(k, float(v), n)

    def averages(self, fmt: str = "{}") -> Dict[str, float]:
        return {fmt.format(k): self._sum[k] / max(1, self._count[k]) for k in self._sum}

    def values(self, fmt: str = "{}") -> Dict[str, float]:
        return {fmt.format(k): v for k, v in self._val.items()}

    def reset(self) -> None:
        self._sum.clear()
        self._count.clear()
        self._val.clear()
