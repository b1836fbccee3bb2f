"""AdamW + linear warmup/decay, the reference training recipe in optax.

Reference: ``/root/reference/optimization.py:7-35`` — AdamW with two parameter
groups (weight decay off for biases and LayerNorm parameters) and an LR that
warms up linearly over ``warmup_steps`` then decays linearly to zero at
``total_steps``. Gradient clipping at 1.0 and gradient accumulation mirror the
Lightning trainer settings (``/root/reference/lightning_pretrain.py:139-141``).

On TPU there is no GradScaler: matmuls run in bf16 with fp32 master params, so
the fp16 skipped-step machinery of the reference (``finetune.py:120-131``)
has no equivalent and is intentionally absent.
"""

from __future__ import annotations


import optax


def linear_warmup_linear_decay(base_lr: float, warmup_steps: int, total_steps: int):
    """LR(step) = base * step/warmup for step < warmup, then
    base * max(0, 1 - step/total) — exactly ``optimization.py:12-17``
    (note the decay is anchored at 0, not at warmup end)."""

    def schedule(step):
        warm = step / max(1, warmup_steps)
        decay = 1.0 - step / max(1, total_steps)
        import jax.numpy as jnp

        return base_lr * jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, decay))

    return schedule


def decay_mask(params) -> dict:
    """True for parameters that receive weight decay: everything except biases
    and LayerNorm scales (``optimization.py:26-30``)."""
    import jax

    def is_decayed(path) -> bool:
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf not in ("bias", "scale")

    return jax.tree_util.tree_map_with_path(lambda path, _: is_decayed(path), params)


def head_label_fn(params) -> dict:
    """'encoder' for everything under the backbone module (``longformer``),
    'head' for the rest (task-head parameters: fraud MLP fc1/fc2/fc3, MLM
    towers, ...). Module names come from the flax setup attributes in
    ``models/heads.py``.

    The real TrainState.params tree is the full flax variables dict with a
    top-level ``'params'`` key, so the backbone key is NOT at path[0] — label
    by whether ``longformer`` appears *anywhere* in the path (works for both
    the wrapped ``{'params': {...}}`` tree and a bare params tree)."""
    import jax

    def mark(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        return "encoder" if "longformer" in keys else "head"

    return jax.tree_util.tree_map_with_path(mark, params)


def create_optimizer(
    learning_rate: float = 5e-5,
    weight_decay: float = 0.0,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    grad_clip: float = 1.0,
    grad_accum_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    head_lr: float | None = None,
) -> optax.GradientTransformation:
    """Single AdamW chain, or — when ``head_lr`` is given — a two-group
    recipe: backbone at ``learning_rate``, task-head parameters at
    ``head_lr`` (same schedule shape). The reference trains every finetune at
    one LR (``finetune_classification.py:433`` lr 5e-5), which round-3
    protocol runs showed cannot train a *freshly initialized* classification
    head within the fraud track's step budget (the oracle proves the signal,
    the backbone trains, yet both fraud legs stay degenerate — see
    docs/RESULTS.md leg 3). Deliberate fix per SURVEY §7.4 policy: the
    standard discriminative-LR recipe. Gradient clipping stays *global*
    (one clip before the group split), matching the reference trainer."""

    def adamw(lr):
        return optax.adamw(
            learning_rate=linear_warmup_linear_decay(lr, warmup_steps, total_steps),
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask if weight_decay > 0 else None,
        )

    if head_lr is None:
        inner = adamw(learning_rate)
    else:
        inner = optax.multi_transform(
            {"encoder": adamw(learning_rate), "head": adamw(head_lr)},
            head_label_fn,
        )
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), inner)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
