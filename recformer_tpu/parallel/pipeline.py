"""Pipeline parallelism: encoder layers staged over a 'pipe' mesh axis.

The reference has no pipeline parallelism (SURVEY §2.2 — a 110M-param encoder
does not need it), so this is a capability extension for models whose layer
stack outgrows one chip's HBM. TPU-native design:

- The encoder's **stacked** layer parameters (``scan_layers=True`` layout —
  one pytree with a leading ``(num_layers,)`` axis) are sharded over the
  ``pipe`` mesh axis: stage ``s`` holds layers
  ``[s*L/S, (s+1)*L/S)``. No per-stage module surgery — the stage body is a
  ``lax.scan`` over the local slice of the same stacked tree the checkpoint
  stores.
- GPipe schedule inside ``shard_map``: the batch splits into M microbatches;
  at tick ``t`` stage ``s`` processes microbatch ``t - s`` and hands its
  activations to stage ``s+1`` with a single ``ppermute`` (ICI
  neighbor-to-neighbor, the cheapest collective on a TPU torus).
- The whole schedule is differentiable — ``ppermute`` has a transpose rule,
  so ``jax.grad`` through this forward yields the standard reverse pipeline
  (1B1F fill/drain) without any hand-written backward.
- Embeddings and pooler run replicated outside the pipeline region (they are
  ~0.1% of the FLOPs; staging them would add two more pipeline bubbles).

Functional contract: identical outputs/gradients to the single-device
``scan_layers`` forward (tested on the virtual mesh). Deterministic
(inference / frozen-dropout) mode only — per-stage dropout streams would
decorrelate from the single-device reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def _stacked_layer_tree(params):
    """The encoder's stacked per-layer param subtree (scan_layers layout)."""
    try:
        return params["params"]["encoder"]["layers"]["layer"]
    except KeyError as e:  # pragma: no cover - guarded by make_* validation
        raise ValueError(
            "pipeline parallelism needs scan_layers=True stacked params "
            "(params/encoder/layers/layer/... with a leading layer axis)"
        ) from e


def make_pipeline_forward(model, mesh: Mesh, num_microbatches: int,
                          axis_name: str = PIPE_AXIS):
    """Backbone forward (embeddings -> pipelined encoder -> pooler).

    ``model``: a ``RecformerModel`` with ``config.scan_layers=True``.
    ``mesh``: 1-D (or containing) mesh with ``axis_name`` of size S;
    ``num_hidden_layers % S == 0`` and batch ``% num_microbatches == 0``.
    Returns ``run(params, batch) -> (hidden, pooled)``.
    """
    from ..models.recformer import merge_attention_masks
    from ..models.encoder import EncoderLayer

    cfg = model.config
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism requires scan_layers=True")
    S = mesh.shape[axis_name]
    if cfg.num_hidden_layers % S:
        raise ValueError(
            f"num_hidden_layers={cfg.num_hidden_layers} not divisible by "
            f"pipe axis {S}")
    M = num_microbatches
    layer_mod = EncoderLayer(cfg, cfg.attention_window[0])

    def stage_apply(local_stack, h, mask):
        def body(carry, layer_params):
            out = layer_mod.apply({"params": layer_params}, carry, mask, True)
            return out, None

        h, _ = jax.lax.scan(body, h, local_stack)
        return h

    def pp_fn(local_stack, x_mbs, mask_mbs):
        # x_mbs: (M, mb, L, hs) replicated; local_stack: this stage's layers
        s = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % S) for i in range(S)]
        buf = jnp.zeros_like(x_mbs[0])
        outs = []
        for t in range(M + S - 1):
            mb = jnp.clip(t - s, 0, M - 1)  # microbatch this stage works on
            x_in = jnp.where(s == 0, jnp.take(x_mbs, mb, axis=0), buf)
            m_in = jnp.take(mask_mbs, mb, axis=0)
            y = stage_apply(local_stack, x_in, m_in)
            outs.append(jnp.where(s == S - 1, y, 0.0))
            if t < M + S - 2:
                buf = jax.lax.ppermute(y, axis_name, perm)
        # ticks S-1 .. M+S-2 drain microbatches 0..M-1 from the last stage;
        # psum replicates them to every stage (all other stages hold zeros)
        hidden = jnp.stack(outs[S - 1:], axis=0)  # (M, mb, L, hs)
        return jax.lax.psum(hidden, axis_name)

    def mapped(stacked, x_mbs, mask_mbs):
        stack_specs = jax.tree.map(lambda _: P(axis_name), stacked)
        return jax.shard_map(
            pp_fn, mesh=mesh, in_specs=(stack_specs, P(), P()),
            out_specs=P(), check_vma=False,
        )(stacked, x_mbs, mask_mbs)

    def embed_only(mdl, input_ids, token_type_ids, item_position_ids):
        return mdl.embeddings(input_ids=input_ids,
                              token_type_ids=token_type_ids,
                              item_position_ids=item_position_ids,
                              deterministic=True)

    def pool_only(mdl, mask, hidden):
        return mdl.pooler(mask, hidden)

    @jax.jit
    def run(params, batch):
        B, L = batch["input_ids"].shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by microbatches {M}")
        mask = merge_attention_masks(batch["attention_mask"],
                                     batch["global_attention_mask"])
        x = model.apply(params, batch["input_ids"], batch["token_type_ids"],
                        batch["item_position_ids"], method=embed_only)
        mb = B // M
        x_mbs = x.reshape(M, mb, L, x.shape[-1])
        mask_mbs = mask.reshape(M, mb, L)
        stacked = _stacked_layer_tree(params)
        hidden_mbs = mapped(stacked, x_mbs, mask_mbs)
        hidden = hidden_mbs.reshape(B, L, x.shape[-1])
        pooled = model.apply(params, mask, hidden, method=pool_only)
        return hidden, pooled

    return run
