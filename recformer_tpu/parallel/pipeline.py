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
- **Dropout streams**: training mode folds (global layer index, microbatch
  index) into the rng inside each stage, so every layer x microbatch draws a
  distinct mask — decorrelated the same way the single-device scan's
  split_rngs are. (Bitwise parity with the single-device dropout pattern is
  not a goal; rate-0 output/grad parity is tested.)

Functional contract: identical outputs/gradients to the single-device
``scan_layers`` forward at dropout rate 0 (tested on the virtual mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def _stacked_layer_tree(params, backbone_key=None):
    """The encoder's stacked per-layer param subtree (scan_layers layout).

    ``backbone_key``: subtree holding the RecformerModel params — e.g.
    ``'longformer'`` for the task heads, ``None`` for a bare RecformerModel.
    """
    try:
        p = params["params"]
        if backbone_key is not None:
            p = p[backbone_key]
        return p["encoder"]["layers"]["layer"]
    except KeyError as e:  # pragma: no cover - guarded by make_* validation
        raise ValueError(
            "pipeline parallelism needs scan_layers=True stacked params "
            "(params/[backbone/]encoder/layers/layer/... with a leading "
            "layer axis)"
        ) from e


def _make_pipelined_encoder(cfg, mesh: Mesh, num_microbatches: int,
                            axis_name: str, deterministic: bool,
                            batch_axis: str | None = None):
    """shard_map-wrapped GPipe encoder: (stacked_params, x (B, L, hs),
    mask (B, L), rng) -> hidden (B, L, hs).

    ``batch_axis``: optional mesh axis the batch dim is sharded over (data x
    pipe composition); collectives inside run over ``axis_name`` only.
    """
    from ..models.encoder import EncoderLayer

    S = mesh.shape[axis_name]
    if cfg.num_hidden_layers % S:
        raise ValueError(
            f"num_hidden_layers={cfg.num_hidden_layers} not divisible by "
            f"pipe axis {S}")
    M = num_microbatches
    layers_per_stage = cfg.num_hidden_layers // S
    layer_mod = EncoderLayer(cfg, cfg.attention_window[0])

    def stage_apply(local_stack, h, mask, rng, stage, mb):
        def body(carry, xs):
            layer_params, li = xs
            rngs = None
            if not deterministic:
                # distinct stream per (global layer, microbatch)
                lg = stage * layers_per_stage + li
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.fold_in(rng, lg), mb)}
            out = layer_mod.apply({"params": layer_params}, carry, mask,
                                  deterministic, rngs=rngs)
            return out, None

        h, _ = jax.lax.scan(body, h,
                            (local_stack, jnp.arange(layers_per_stage)))
        return h

    def pp_fn(local_stack, x_mbs, mask_mbs, rng):
        # x_mbs: (M, mb, L, hs); local_stack: this stage's layers
        s = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % S) for i in range(S)]
        buf = jnp.zeros_like(x_mbs[0])
        outs = []
        for t in range(M + S - 1):
            mb = jnp.clip(t - s, 0, M - 1)  # microbatch this stage works on
            x_in = jnp.where(s == 0, jnp.take(x_mbs, mb, axis=0), buf)
            m_in = jnp.take(mask_mbs, mb, axis=0)
            y = stage_apply(local_stack, x_in, m_in, rng, s, mb)
            outs.append(jnp.where(s == S - 1, y, 0.0))
            if t < M + S - 2:
                buf = jax.lax.ppermute(y, axis_name, perm)
        # ticks S-1 .. M+S-2 drain microbatches 0..M-1 from the last stage;
        # psum replicates them to every stage (all other stages hold zeros)
        hidden = jnp.stack(outs[S - 1:], axis=0)  # (M, mb, L, hs)
        return jax.lax.psum(hidden, axis_name)

    mb_spec = P(None, batch_axis)  # (M, mb, ...) with mb optionally sharded

    def run(stacked, x, mask, rng):
        B, L = mask.shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by microbatches {M}")
        mb = B // M
        x_mbs = x.reshape(M, mb, L, x.shape[-1])
        mask_mbs = mask.reshape(M, mb, L)
        stack_specs = jax.tree.map(lambda _: P(axis_name), stacked)
        hidden_mbs = jax.shard_map(
            pp_fn, mesh=mesh,
            in_specs=(stack_specs, mb_spec, mb_spec, P()),
            out_specs=mb_spec, check_vma=False,
        )(stacked, x_mbs, mask_mbs, rng)
        return hidden_mbs.reshape(B, L, x.shape[-1])

    return run


def make_pipeline_forward(model, mesh: Mesh, num_microbatches: int,
                          axis_name: str = PIPE_AXIS,
                          deterministic: bool = True):
    """Backbone forward (embeddings -> pipelined encoder -> pooler).

    ``model``: a ``RecformerModel`` with ``config.scan_layers=True``.
    ``mesh``: 1-D (or containing) mesh with ``axis_name`` of size S;
    ``num_hidden_layers % S == 0`` and batch ``% num_microbatches == 0``.
    Returns ``run(params, batch, rng=None) -> (hidden, pooled)``; ``rng``
    drives the dropout streams when ``deterministic=False``.
    """
    from ..models.recformer import merge_attention_masks

    cfg = model.config
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism requires scan_layers=True")
    encoder_run = _make_pipelined_encoder(cfg, mesh, num_microbatches,
                                          axis_name, deterministic)

    def embed_only(mdl, input_ids, token_type_ids, item_position_ids):
        return mdl.embeddings(input_ids=input_ids,
                              token_type_ids=token_type_ids,
                              item_position_ids=item_position_ids,
                              deterministic=deterministic)

    def pool_only(mdl, mask, hidden):
        return mdl.pooler(mask, hidden)

    @jax.jit
    def run(params, batch, rng=None):
        if not deterministic and rng is None:
            raise ValueError("deterministic=False requires an rng")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_embed, rng_pipe = jax.random.split(rng)
        mask = merge_attention_masks(batch["attention_mask"],
                                     batch["global_attention_mask"])
        x = model.apply(params, batch["input_ids"], batch["token_type_ids"],
                        batch["item_position_ids"], method=embed_only,
                        rngs=None if deterministic else {"dropout": rng_embed})
        hidden = encoder_run(_stacked_layer_tree(params), x, mask, rng_pipe)
        pooled = model.apply(params, mask, hidden, method=pool_only)
        return hidden, pooled

    return run


def make_pipeline_pretrain_step(config, model, mesh: Mesh,
                                num_microbatches: int,
                                axis_name: str = PIPE_AXIS):
    """Full GPipe pretraining step (dual tower + fused MLM passes + InfoNCE +
    MLM CE), differentiable through the pipeline — the driver-reachable PP
    training mode. ``model`` is a ``RecformerForPretraining`` with
    ``scan_layers=True``; ``mesh`` may also carry a 'data' axis (batch
    sharded over it, grads averaged by GSPMD).

    Returns step(state, rng, table, item_ids, seq_lens) -> (state, metrics),
    the same contract as ``training.steps.make_pretrain_step``.
    """
    from ..data.device_pipeline import make_pretrain_batch
    from ..models.recformer import merge_attention_masks
    from ..parallel.mesh import DATA_AXIS
    from ..training import losses

    cfg = config
    if not cfg.scan_layers:
        raise ValueError("pipeline parallelism requires scan_layers=True")
    deterministic_embed = False
    batch_axis = DATA_AXIS if DATA_AXIS in mesh.shape else None
    encoder_run = _make_pipelined_encoder(
        cfg, mesh, num_microbatches, axis_name, deterministic=False,
        batch_axis=batch_axis)
    encoder_run_short = encoder_run  # same schedule; shapes differ per tower

    def embed_only(mdl, input_ids, token_type_ids, item_position_ids):
        return mdl.longformer.embeddings(
            input_ids=input_ids, token_type_ids=token_type_ids,
            item_position_ids=item_position_ids,
            deterministic=deterministic_embed)

    def pool_only(mdl, mask, hidden):
        return mdl.longformer.pooler(mask, hidden)

    def lm_only(mdl, gathered):
        h = mdl.lm_head(gathered)
        logits = mdl.longformer.embeddings.word_embeddings.attend(h)
        return logits.astype(jnp.float32) + mdl.lm_head.bias.astype(jnp.float32)

    def tower(params, batch, rng, run):
        """Clean + MLM passes fused into one (2B, L) pipelined forward."""
        rng_embed, rng_pipe = jax.random.split(rng)
        has_mlm = "mlm_input_ids" in batch

        def dup(x):
            return jnp.concatenate([x, x], axis=0) if has_mlm else x

        ids = (jnp.concatenate([batch["input_ids"], batch["mlm_input_ids"]], 0)
               if has_mlm else batch["input_ids"])
        mask = merge_attention_masks(dup(batch["attention_mask"]),
                                     dup(batch["global_attention_mask"]))
        x = model.apply(params, ids, dup(batch["token_type_ids"]),
                        dup(batch["item_position_ids"]), method=embed_only,
                        rngs={"dropout": rng_embed})
        hidden = run(_stacked_layer_tree(params, "longformer"), x, mask,
                     rng_pipe)
        pooled = model.apply(params, mask, hidden, method=pool_only)
        B = batch["input_ids"].shape[0]
        if not has_mlm:
            return pooled, None
        z = pooled[:B]
        gathered = jnp.take_along_axis(
            hidden[B:], batch["mlm_positions"][:, :, None], axis=1)
        logits = model.apply(params, gathered, method=lm_only)
        return z, logits

    def loss_fn(params, rng, batch_a, batch_b):
        rng_a, rng_b = jax.random.split(rng)
        z1, mlm_a = tower(params, batch_a, rng_a, encoder_run)
        z2, mlm_b = tower(params, batch_b, rng_b, encoder_run_short)
        cl_loss, correct, total = losses.info_nce_loss(
            z1, z2, cfg.temp, grad_mode=cfg.contrastive_gradient)
        loss = cl_loss
        metrics = {"cl_loss": cl_loss, "cl_correct": correct, "cl_total": total}
        if mlm_a is not None:
            m = losses.mlm_loss(mlm_a, batch_a["mlm_labels"])
            loss = loss + cfg.mlm_weight * m
            metrics["mlm_loss_a"] = m
        if mlm_b is not None:
            m = losses.mlm_loss(mlm_b, batch_b["mlm_labels"])
            loss = loss + cfg.mlm_weight * m
            metrics["mlm_loss_b"] = m
        metrics["loss"] = loss
        metrics["accuracy"] = correct / jnp.maximum(total, 1e-5)
        return loss, metrics

    rep = NamedSharding(mesh, P())
    data = (NamedSharding(mesh, P(batch_axis)) if batch_axis else rep)

    @functools.partial(jax.jit, in_shardings=(rep, rep, rep, data, data),
                       out_shardings=(rep, rep))
    def step(state, rng, table, item_ids, seq_lens):
        rng_data, rng_drop = jax.random.split(
            jax.random.fold_in(rng, state.step))
        batch_a, batch_b = make_pretrain_batch(rng_data, table, item_ids,
                                               seq_lens, cfg)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng_drop, batch_a, batch_b)
        return state.apply_gradients(grads=grads), metrics

    return step
