"""Sequence-parallel (context-parallel) windowed + global attention.

The reference scales context *algorithmically* (Longformer windowed attention,
SURVEY §5.7) but never shards the sequence — every device holds all L tokens.
This module adds the TPU-native scaling axis on top: shard L across a mesh
axis and exchange only what the window structure actually needs.

Key observation: a ±window/2 banded attention is *local* — a shard holding a
contiguous L/n slice of the sequence needs exactly window/2 keys/values of
halo from each neighbor, NOT a full ring pass over all K/V (ring attention /
Ulysses solve the dense-attention problem; for banded attention they would
move ~n times more data than necessary). The only non-local interactions are
the (<= max_globals, in this model exactly 1: the CLS row) global tokens:

- local->global: every shard needs the global positions' standard K/V
  columns -> one tiny ``all_gather`` of (B, G, H, D) per shard.
- global->all: the global query row attends over ALL positions' dedicated
  global K/V -> a flash-style distributed softmax (per-shard partial max /
  numerator / denominator merged with ``pmax``/``psum``), never
  materializing the full row.

Communication per layer: 2 ppermutes of (B, window/2, H*D) halo + all_gathers
of (B, n*G, H*D) + psums of (B, n*G, H*D) — all O(window + n*G), independent
of L. Everything else (LayerNorm, FFN, projections) is per-token and shards
trivially, so wrapping this op in shard_map makes the whole encoder
sequence-parallel.

Semantics identical to ``ops.attention.dense_attention`` on the gathered
result (tested against it on a CPU mesh). Behavioral spec as in
``ops/attention.py`` (mask coding {0,1,2}; reference
``recformer/models.py:262-272``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import NEG_INF, global_prefix_indices

SEQ_AXIS = "seq"


def _halo_exchange(x: jnp.ndarray, half: int, axis_name: str, n: int):
    """Concatenate each shard's slice with ``half`` entries from its left and
    right neighbours along dim 1. Edge shards receive zeros (ppermute
    zero-fills missing sources), which the mask coding treats as padding."""
    if n == 1:
        pad = [(0, 0)] * x.ndim
        pad[1] = (half, half)
        return jnp.pad(x, pad)
    # right-shift: shard i sends its LAST half rows to shard i+1 (its right
    # neighbour's left halo)
    left_halo = jax.lax.ppermute(
        x[:, -half:], axis_name, [(i, i + 1) for i in range(n - 1)])
    # left-shift: shard i sends its FIRST half rows to shard i-1
    right_halo = jax.lax.ppermute(
        x[:, :half], axis_name, [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def _banded_local(q, k_ext, v_ext, keyok_ext, window: int, scale, gk, gv, g_ok,
                  dropout_rate: float = 0.0, dropout_rng=None):
    """Banded attention of local queries against pre-haloed keys/values.

    q: (B, Ls, H, D); k_ext/v_ext: (B, Ls + window, H, D); keyok_ext:
    (B, Ls + window) bool — key is a *local* (attendable) position;
    gk/gv: (B, NG, H, D) gathered global columns with validity g_ok (B, NG).
    Returns (B, Ls, H, D).
    """
    B, Ls, H, D = q.shape
    half = window // 2
    block = min(128, Ls)
    nb = Ls // block
    band = block + 2 * half

    kidx = (jnp.arange(nb) * block)[:, None] + jnp.arange(band)[None, :]  # offsets into ext
    k_b = jnp.take(k_ext, kidx, axis=1)  # (B, nb, band, H, D)
    v_b = jnp.take(v_ext, kidx, axis=1)
    ok_b = jnp.take(keyok_ext, kidx, axis=1)  # (B, nb, band)

    t = jnp.arange(block)[:, None]
    u = jnp.arange(band)[None, :]
    in_window = jnp.abs(t - (u - half)) <= half  # (block, band)
    allowed = ok_b[:, :, None, :] & in_window[None, None]

    qb = q.reshape(B, nb, block, H, D)
    scores = jnp.einsum("bnthd,bnuhd->bhntu", qb * scale, k_b,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(allowed[:, None], scores, NEG_INF)

    g_scores = jnp.einsum("bnthd,bghd->bhntg", qb * scale, gk,
                          preferred_element_type=jnp.float32)
    g_scores = jnp.where(g_ok[:, None, None, None, :], g_scores, NEG_INF)

    all_scores = jnp.concatenate([scores, g_scores], axis=-1).astype(jnp.float32)
    m = jnp.max(all_scores, axis=-1, keepdims=True)
    e = jnp.exp(all_scores - jax.lax.stop_gradient(m))
    probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhntu,bnuhd->bnthd", probs[..., :band].astype(q.dtype), v_b)
    out = out + jnp.einsum("bhntg,bghd->bnthd", probs[..., band:].astype(q.dtype), gv)
    return out.reshape(B, Ls, H, D)


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_g: jnp.ndarray,
    k_g: jnp.ndarray,
    v_g: jnp.ndarray,
    mask: jnp.ndarray,
    window: int,
    axis_name: str = SEQ_AXIS,
    max_globals: int = 1,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Per-shard body (call INSIDE shard_map with dim 1 of every operand
    sharded over ``axis_name``). Same contract as
    :func:`ops.attention.dense_attention`, with q/k/v/q_g/k_g/v_g per-shard
    ``(B, L/n, H, D)`` and mask ``(B, L/n)``."""
    B, Ls, H, D = q.shape
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    half = window // 2
    if half > Ls:
        raise ValueError(f"shard length {Ls} must be >= window/2={half}")
    scale = 1.0 / jnp.sqrt(jnp.array(D, jnp.float32)).astype(q.dtype)
    is_pad = mask == 0
    is_global = mask == 2
    G = max_globals

    rng_band = rng_glb = None
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires a dropout_rng key")
        # distinct streams per shard: banded keys and the global row's local
        # key slice are disjoint per shard, so each shard folds in its index
        rng_band, rng_glb = jax.random.split(dropout_rng)
        rng_band = jax.random.fold_in(rng_band, idx)

    # --- halo exchange for the banded part -----------------------------
    k_ext = _halo_exchange(k, half, axis_name, n)
    v_ext = _halo_exchange(v, half, axis_name, n)
    keyok_ext = _halo_exchange((mask == 1).astype(jnp.int32)[..., None],
                               half, axis_name, n)[..., 0] != 0

    # --- gather global (CLS) standard-K/V columns from every shard -----
    gidx, gvalid = global_prefix_indices(mask, G)  # local (B, G)
    gk_loc = jnp.take_along_axis(k, gidx[:, :, None, None], axis=1)
    gv_loc = jnp.take_along_axis(v, gidx[:, :, None, None], axis=1)
    gk_all = jax.lax.all_gather(gk_loc, axis_name, axis=1)  # (B, n, G, H, D)
    gv_all = jax.lax.all_gather(gv_loc, axis_name, axis=1)
    gok_all = jax.lax.all_gather(gvalid, axis_name, axis=1)  # (B, n, G)
    gk_all = gk_all.reshape(B, n * G, H, D)
    gv_all = gv_all.reshape(B, n * G, H, D)
    gok_all = gok_all.reshape(B, n * G)

    out = _banded_local(q, k_ext, v_ext, keyok_ext, window, scale,
                        gk_all, gv_all, gok_all, dropout_rate, rng_band)

    # --- global query rows: flash-style distributed softmax ------------
    # every shard contributes its local k_g/v_g slice to every shard's
    # global query; queries are all_gathered (tiny: n*G rows)
    if q_g.shape[1] == G and G != Ls:
        qg_loc = q_g  # pre-gathered at this shard's global rows (encoder path)
    else:
        qg_loc = jnp.take_along_axis(q_g, gidx[:, :, None, None], axis=1)  # (B, G, H, D)
    qg_all = jax.lax.all_gather(qg_loc, axis_name, axis=1).reshape(B, n * G, H, D)
    g_scores = jnp.einsum("bghd,bmhd->bhgm", qg_all * scale, k_g,
                          preferred_element_type=jnp.float32)  # (B, H, nG, Ls)
    g_scores = jnp.where(is_pad[:, None, None, :], NEG_INF, g_scores)
    m_loc = jnp.max(g_scores, axis=-1)  # (B, H, nG)
    # numerical-stability max only — pmax has no differentiation rule, so
    # the stop_gradient must come BEFORE it (its output is constant wrt loss)
    m_glob = jax.lax.pmax(jax.lax.stop_gradient(m_loc), axis_name)
    # guard fully-masked shards: exp(NEG_INF - m) underflows to 0 anyway
    e = jnp.exp(g_scores - m_glob[..., None])
    if dropout_rate > 0.0:
        # each shard drops its OWN key slice (keys are disjoint across
        # shards); the denominator stays undropped, matching _prob_dropout
        keep = jax.random.bernoulli(
            jax.random.fold_in(rng_glb, idx), 1.0 - dropout_rate, e.shape)
        e_drop = jnp.where(keep, e / (1.0 - dropout_rate), 0.0)
    else:
        e_drop = e
    num_loc = jnp.einsum("bhgm,bmhd->bghd", e_drop.astype(jnp.float32),
                         v_g.astype(jnp.float32))
    den_loc = jnp.sum(e, axis=-1)  # (B, H, nG)
    num = jax.lax.psum(num_loc, axis_name)  # (B, nG, H, D)
    den = jax.lax.psum(den_loc, axis_name)
    g_out = num / jnp.maximum(den, 1e-30).transpose(0, 2, 1)[..., None]
    g_out = g_out.astype(q.dtype)  # (B, nG, H, D)
    gok_t = gok_all  # (B, nG)
    g_out = jnp.where(gok_t[:, :, None, None], g_out, 0.0)

    # scatter this shard's slice of global outputs back into its rows
    mine = jax.lax.dynamic_slice_in_dim(g_out, idx * G, G, axis=1)  # (B, G, H, D)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], gidx.shape)
    g_rows = jnp.zeros_like(out).at[b_idx, gidx].add(mine)

    out = jnp.where(is_global[:, :, None, None], g_rows, out)
    out = jnp.where(is_pad[:, :, None, None], 0.0, out)
    return out


def make_sequence_parallel_forward(model, mesh: Mesh,
                                   axis_name: str = SEQ_AXIS):
    """Full backbone forward (embeddings -> encoder -> pooler) with the TOKEN
    dim sharded over ``axis_name`` — contexts larger than one chip's HBM.

    ``model`` is a ``RecformerModel`` whose config has
    ``attention_impl='sequence_parallel'`` (the encoder then calls the halo
    op, which requires being inside this shard_map). Returns
    ``run(params, batch, rng=None) -> (hidden, pooled)``.

    NOTE: initialize ``params`` with a non-SP config (e.g.
    ``cfg.replace(attention_impl='chunked')`` — identical param tree):
    ``model.init`` runs the forward outside the mesh, where the SP op's
    collectives have no bound axis.

    The only cross-shard sequential dependency outside attention is the
    padding-aware position-id cumsum — computed full-length OUTSIDE the
    shard_map (a trivial sharded prefix op under GSPMD) and passed through
    the model's ``position_ids`` input. CLS pooling also happens outside
    (row 0 of the sharded hidden). Hidden dropout streams are decorrelated
    across shards by folding the shard index into the rng.
    """
    from ..models.embeddings import create_position_ids_from_input_ids
    from ..models.recformer import merge_attention_masks

    cfg = model.config
    spec = P(None, axis_name)

    def encode_only(mdl, input_ids, attention_mask, global_attention_mask,
                    token_type_ids, item_position_ids, position_ids,
                    deterministic):
        mask = merge_attention_masks(attention_mask, global_attention_mask)
        x = mdl.embeddings(input_ids=input_ids, token_type_ids=token_type_ids,
                           item_position_ids=item_position_ids,
                           position_ids=position_ids,
                           deterministic=deterministic)
        return mdl.encoder(x, mask, deterministic)

    def shard_fn(params, rng, input_ids, attention_mask, global_attention_mask,
                 token_type_ids, item_position_ids, position_ids):
        deterministic = rng is None
        rngs = None
        if not deterministic:
            rngs = {"dropout": jax.random.fold_in(
                rng, jax.lax.axis_index(axis_name))}
        return model.apply(params, input_ids, attention_mask,
                           global_attention_mask, token_type_ids,
                           item_position_ids, position_ids, deterministic,
                           method=encode_only, rngs=rngs)

    def mapped(params, rng, *arrays):
        # params/rng replicated (P() prefix specs), token dim sharded
        return jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(P(), P()) + (spec,) * 6,
            out_specs=spec, check_vma=False,
        )(params, rng, *arrays)

    @functools.partial(jax.jit, static_argnames=("deterministic",))
    def run(params, batch, rng=None, deterministic=True):
        pos = create_position_ids_from_input_ids(batch["input_ids"],
                                                 cfg.pad_token_id)
        arrays = (batch["input_ids"], batch["attention_mask"],
                  batch["global_attention_mask"], batch["token_type_ids"],
                  batch["item_position_ids"], pos)
        hidden = mapped(params, None if deterministic else rng, *arrays)
        merged = merge_attention_masks(batch["attention_mask"],
                                       batch["global_attention_mask"])
        if cfg.pooler_type == "cls":
            pooled = hidden[:, 0]
        else:
            w = merged.astype(hidden.dtype)
            pooled = (hidden * w[:, :, None]).sum(1) / jnp.maximum(
                w.sum(-1), 1e-6)[:, None]
        return hidden, pooled

    return run


def make_sequence_parallel_attention(mesh: Mesh, window: int,
                                     axis_name: str = SEQ_AXIS,
                                     max_globals: int = 1):
    """shard_map-wrapped entry point: takes FULL (B, L, H, D)/(B, L) arrays,
    shards dim 1 over ``axis_name`` of ``mesh``, returns the full output.

    L must divide the axis size and each shard must hold >= window/2 tokens.
    """
    spec = P(None, axis_name)
    fn = functools.partial(sequence_parallel_attention, window=window,
                           axis_name=axis_name, max_globals=max_globals)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )

    @jax.jit
    def run(q, k, v, q_g, k_g, v_g, mask):
        return mapped(q, k, v, q_g, k_g, v_g, mask)

    return run


def make_sp_pretrain_step(config, model, mesh: Mesh,
                          axis_name: str = None):
    """Full pretraining step with the LONG sequence tower's token dim sharded
    over the mesh's seq axis (context parallelism) — the driver-reachable SP
    training mode. The short item tower (``item_seq_len`` tokens) runs the
    plain replicated-token forward with the *identical* param tree (config
    differs only in ``attention_impl``, which is weight-free).

    ``model``: ``RecformerForPretraining`` with
    ``attention_impl='sequence_parallel'`` and ``global_kv_mode='full'``.
    ``mesh`` may also carry a 'data' axis (batch sharded over it).

    Returns step(state, rng, table, item_ids, seq_lens) -> (state, metrics),
    the same contract as ``training.steps.make_pretrain_step``. Dropout
    streams are decorrelated across seq shards by folding the shard index
    into the rng (reference dropout *rate* semantics preserved; bitwise mask
    parity with the unsharded step is not a goal).
    """
    from ..data.device_pipeline import make_pretrain_batch
    from ..models.embeddings import create_position_ids_from_input_ids
    from ..models.heads import RecformerForPretraining
    from ..models.recformer import merge_attention_masks
    from ..parallel.mesh import DATA_AXIS
    from ..training import losses
    from jax.sharding import NamedSharding

    cfg = config
    axis_name = axis_name or cfg.sequence_axis
    if cfg.attention_impl != "sequence_parallel":
        raise ValueError("make_sp_pretrain_step needs "
                         "attention_impl='sequence_parallel'")
    if cfg.global_kv_mode != "full":
        raise ValueError("sequence parallelism shards the full-length "
                         "k_g/v_g tensors: set global_kv_mode='full'")
    S = mesh.shape[axis_name]
    half = max(cfg.attention_window) // 2
    if cfg.max_token_num % S or (cfg.max_token_num // S) < half:
        raise ValueError(
            f"max_token_num={cfg.max_token_num} over {S} seq shards leaves "
            f"<{half} (window/2) tokens per shard")
    batch_axis = DATA_AXIS if DATA_AXIS in mesh.shape else None
    spec = P(batch_axis, axis_name)

    # item tower: identical params, tokens replicated, chunked XLA attention
    model_b = RecformerForPretraining(cfg.replace(attention_impl="chunked"))

    def encode_only(mdl, input_ids, merged_mask, token_type_ids,
                    item_position_ids, position_ids):
        x = mdl.longformer.embeddings(
            input_ids=input_ids, token_type_ids=token_type_ids,
            item_position_ids=item_position_ids, position_ids=position_ids,
            deterministic=False)
        return mdl.longformer.encoder(x, merged_mask, deterministic=False)

    def shard_fn(params, rng, ids, merged, tt, ipos, pos):
        rngs = {"dropout": jax.random.fold_in(
            rng, jax.lax.axis_index(axis_name))}
        return model.apply(params, ids, merged, tt, ipos, pos,
                           method=encode_only, rngs=rngs)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P()) + (spec,) * 5,
        out_specs=spec, check_vma=False)

    def pool_only(mdl, mask, hidden):
        return mdl.longformer.pooler(mask, hidden)

    def lm_only(mdl, gathered):
        h = mdl.lm_head(gathered)
        logits = mdl.longformer.embeddings.word_embeddings.attend(h)
        return logits.astype(jnp.float32) + mdl.lm_head.bias.astype(jnp.float32)

    def tower_sp(params, batch, rng):
        """Sequence view: clean + MLM passes fused into one (2B, L) SP
        forward (mirrors heads.RecformerForPretraining._tower)."""
        has_mlm = "mlm_input_ids" in batch

        def dup(x):
            return jnp.concatenate([x, x], axis=0) if has_mlm else x

        ids = (jnp.concatenate([batch["input_ids"], batch["mlm_input_ids"]], 0)
               if has_mlm else batch["input_ids"])
        merged = merge_attention_masks(dup(batch["attention_mask"]),
                                       dup(batch["global_attention_mask"]))
        # padding-aware position ids: full-length cumsum OUTSIDE the
        # shard_map (a sharded prefix op under GSPMD)
        pos = create_position_ids_from_input_ids(ids, cfg.pad_token_id)
        hidden = mapped(params, rng, ids, merged, dup(batch["token_type_ids"]),
                        dup(batch["item_position_ids"]), pos)
        pooled = model.apply(params, merged, hidden, method=pool_only)
        B = batch["input_ids"].shape[0]
        if not has_mlm:
            return pooled, None
        z = pooled[:B]
        gathered = jnp.take_along_axis(
            hidden[B:], batch["mlm_positions"][:, :, None], axis=1)
        return z, model.apply(params, gathered, method=lm_only)

    def loss_fn(params, rng, batch_a, batch_b):
        rng_a, rng_b = jax.random.split(rng)
        z1, mlm_a = tower_sp(params, batch_a, rng_a)
        z2, mlm_b = model_b.apply(params, batch_b, False, method="_tower",
                                  rngs={"dropout": rng_b})
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
    data = NamedSharding(mesh, P(batch_axis)) if batch_axis else rep

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
