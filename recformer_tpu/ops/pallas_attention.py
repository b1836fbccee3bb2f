"""Fused Pallas TPU kernel for Longformer-style windowed + global attention.

Semantics identical to ``attention.py`` (see that module's docstring and the
behavioral spec it re-derives from the reference's HF Longformer dependency,
``/root/reference/recformer/models.py:12-18``): local queries attend to a
±window/2 band of *local* keys plus all global keys in one softmax; global
query rows run full attention with dedicated projections; padding is inert.

Kernel design ("flat-lane" layout — one program per (batch, head-pair)):

- All operands stay in the model's native ``(B, L, H*D)`` layout; the wrapper
  only *reshapes* (a free minor-dim split/merge) — it never transposes. This
  removed the ~44 ms/step of layout-copy fusions the earlier per-head
  ``(B*H, L, D)`` layout required (profile in docs/PERF.md).
- The lane (minor) dimension is blocked in chunks of ``hpb * D`` where
  ``hpb = 128 // D`` heads per program (lane blocks must be multiples of the
  128-wide TPU lane tiling; for head_dim 64 that is two heads). Heads are
  sliced *inside* the kernel with static, 64-aligned lane slices —
  ``ref[0, ds(i*bq, bq), h*D:(h+1)*D]`` — which Mosaic supports for both
  reads and writes (verified by a minimal TPU probe; only *dynamic* lane
  offsets are restricted).
- Query blocks iterate inside the program (python loop, unrolled at trace
  time), amortizing the ~1.1 us fixed per-program cost.
- K/V arrive UNPADDED ``(L, hpb*D)`` and live whole in VMEM per program
  (~0.3 MB at Longformer-base scale, far under the 16 MB budget); each query
  block reads its band at a statically clamped offset with a per-block mask
  shift, so the window-padding HBM copies are gone.
- The banded scores ``(block_q, block_q + window [+G])`` are softmaxed in
  fp32 in one shot (no online softmax needed at these band widths) and
  contracted with V on the MXU; global key columns join the same softmax as
  extra columns.
- Backward is a second fused kernel (custom VJP): it recomputes the band
  softmax and accumulates dK/dV across overlapping query blocks in fp32 VMEM
  scratch, writing only the final bf16 (L, lane) result to HBM.
- Epilogue (G == 1): the global-row overwrite and pad-row zeroing are fused
  into the kernel (the wrapper passes the {0,1,2} mask column and the compact
  (B, G, H·D) global-row output); the backward routes the global rows'
  upstream gradient to a dedicated ``dgout`` output.

The host-side wrapper handles the gather of global K/V and the compact
global-row attention — all differentiable jnp, so only the banded core needs
the custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF, _global_rows, global_prefix_indices

DEFAULT_BLOCK_Q = 256  # swept best fwd+bwd at Longformer-base shapes (128: 41.4, 256: 43.0, 512: 42.3 ex/s)


def _band_iota_mask(block_q: int, band: int, half: int, shift: int = None):
    """(block_q, band) in-window mask: query row t (absolute ``i*bq + t``)
    sees band column u (absolute key ``off + u``) iff
    ``|t + shift - u| <= half`` where ``shift = i*bq - off``. The default
    ``shift=half`` is the interior-block case (band starts half a window
    before the query block); boundary blocks clamp ``off`` into [0, L-band]
    and pass their own shift."""
    if shift is None:
        shift = half
    t = jax.lax.broadcasted_iota(jnp.int32, (block_q, band), 0)
    u = jax.lax.broadcasted_iota(jnp.int32, (block_q, band), 1)
    return jnp.abs(t - (u - shift)) <= half


def _band_offsets(L: int, block_q: int, window: int):
    """Static per-query-block (offset, shift) pairs for reading the banded
    keys directly from the UNPADDED (L, lane) K/V: ``off`` is clamped into
    [0, L - band] so no out-of-bounds rows exist (window padding eliminated),
    and ``shift`` feeds :func:`_band_iota_mask`."""
    half = window // 2
    band = min(block_q + window, L)
    offs = []
    for i in range(L // block_q):
        off = min(max(i * block_q - half, 0), L - band)
        offs.append((off, i * block_q - off))
    return band, offs


def _dropout_keep(seed, b, hp, i, h, nb: int, hpb: int,
                  rows: int, cols: int, rate: float):
    """(rows, cols) keep-mask from the TPU hardware PRNG. Seeding is fully
    determined by (seed, program ids, loop indices), so the backward kernel
    regenerates the exact mask the forward kernel drew. Mosaic's prng_seed
    takes at most two values, so (b, hp, i, h) fold into one per-draw index.
    The draw is padded to a 128-multiple lane width (Mosaic vector tiling)
    and statically sliced."""
    cols_pad = ((cols + 127) // 128) * 128
    combo = ((b * pl.num_programs(1) + hp) * nb + i) * hpb + h
    pltpu.prng_seed(seed, combo)
    bits = pltpu.prng_random_bits((rows, cols_pad)).astype(jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return bits[:, :cols] >= thresh


def _heads_per_block(num_heads: int, head_dim: int) -> int:
    """Heads handled by one program: lane blocks must be 128-multiples, so
    pack 128 // head_dim heads per block when that divides the head count;
    otherwise fall back to the full (unblocked) lane dimension."""
    if head_dim >= 128 and head_dim % 128 == 0:
        return 1
    if 128 % head_dim == 0 and num_heads % (128 // head_dim) == 0:
        return 128 // head_dim
    return num_heads


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, keyloc_ref, gk_ref, gv_ref, gvalid_ref,
                mrow_ref, gout_ref, seed_ref, out_ref, *, block_q: int,
                window: int, num_globals: int, scale: float, nb: int, hpb: int,
                head_dim: int, dropout_rate: float, fuse_epilogue: bool,
                L: int):
    half = window // 2
    band, offs = _band_offsets(L, block_q, window)
    in_dtype = q_ref.dtype
    g_ok = gvalid_ref[0, 0, :] != 0

    for i in range(nb):
        off, shift = offs[i]
        win_mask = _band_iota_mask(block_q, band, half, shift)
        key_ok = keyloc_ref[0, pl.ds(off, band), 0] != 0  # (band,)
        loc_mask = win_mask & key_ok[None, :]
        # Mosaic cannot concat i1 vregs ("Invalid vector register cast") —
        # concat in int32 and compare after.
        col_mask = jnp.concatenate(
            [loc_mask.astype(jnp.int32),
             jnp.broadcast_to(g_ok[None, :].astype(jnp.int32),
                              (block_q, num_globals))],
            axis=1) != 0  # (block_q, band + G)
        if fuse_epilogue:
            mrow = mrow_ref[0, pl.ds(i * block_q, block_q), 0]  # (block_q,)
            is_glb = (mrow == 2)[:, None]
            is_loc = (mrow == 1)[:, None]
        for h in range(hpb):
            lo = h * head_dim
            q = q_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim]
            q = q * jnp.asarray(scale, in_dtype)
            k_band = k_ref[0, pl.ds(off, band), lo:lo + head_dim]
            v_band = v_ref[0, pl.ds(off, band), lo:lo + head_dim]
            # append the global rows to the band OPERANDS (a (G, D) sublane
            # concat) instead of concatenating the (bq, band|G) fp32 score
            # matrices: one full-width bf16 MXU dot replaces band-dot +
            # degenerate fp32 G-dot + big score concat (the +0.37 ms item in
            # the kernel cost anatomy, docs/PERF.md).
            kext = jnp.concatenate([k_band, gk_ref[0, :, lo:lo + head_dim]],
                                   axis=0)  # (band + G, D)
            vext = jnp.concatenate([v_band, gv_ref[0, :, lo:lo + head_dim]],
                                   axis=0)

            scores = jax.lax.dot_general(
                q, kext, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, band + G)
            scores = jnp.where(col_mask, scores, NEG_INF)

            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
            if dropout_rate > 0.0:
                keep = _dropout_keep(seed_ref[0], pl.program_id(0),
                                     pl.program_id(1), i, h, nb, hpb,
                                     block_q, band + num_globals, dropout_rate)
                e = jnp.where(keep, e * (1.0 / (1.0 - dropout_rate)), 0.0)

            # contract the UN-normalized exponentials and divide the (bq, D)
            # output: the (bq, band+G) probability divide is VPU work on the
            # kernel's critical path (the band matmuls use <5% of the MXU;
            # measured 1.74 -> 1.64 ms fwd). A/B'd and NOT kept: splitting the
            # softmax to avoid the band|globals concatenate (fwd 2.08, bwd
            # 3.63 - Mosaic handles the concat better than split pieces), and
            # folding 1/denom into dout in the backward (2.55 vs 2.41).
            out = jax.lax.dot_general(
                e.astype(in_dtype), vext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = out / denom
            if fuse_epilogue:
                # global-row overwrite + pad-row zeroing, fused here instead
                # of two (B, L, H, D) HBM `where` passes (+ layout copies —
                # D=64 < the 128-lane tile, so the 4-D reshape is a real
                # copy) after the kernel. G == 1 only: the single global
                # row's output broadcasts over the mask==2 rows.
                gout_row = gout_ref[0, :, lo:lo + head_dim].astype(jnp.float32)
                out = jnp.where(is_glb, gout_row,
                                jnp.where(is_loc, out, 0.0))
            out_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim] = (
                out.astype(out_ref.dtype))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, keyloc_ref, gk_ref, gv_ref, gvalid_ref,
                mrow_ref, gout_ref, seed_ref, dout_ref,
                dq_ref, dk_ref, dv_ref, dgk_ref, dgv_ref, dgout_ref,
                dk_scr, dv_scr,
                *, block_q: int, window: int, num_globals: int,
                scale: float, nb: int, hpb: int, head_dim: int,
                dropout_rate: float, fuse_epilogue: bool, L: int):
    half = window // 2
    band, offs = _band_offsets(L, block_q, window)
    in_dtype = q_ref.dtype

    # dK/dV accumulate across overlapping bands in fp32 VMEM *scratch*; only
    # the final bf16 result is written to HBM (the padded-fp32-output scheme
    # cost a 2x-sized write plus a slice+cast pass outside the kernel)
    dk_scr[...] = jnp.zeros_like(dk_scr)
    dv_scr[...] = jnp.zeros_like(dv_scr)

    g_ok = gvalid_ref[0, 0, :] != 0
    dgk_acc = [jnp.zeros((num_globals, head_dim), jnp.float32) for _ in range(hpb)]
    dgv_acc = [jnp.zeros((num_globals, head_dim), jnp.float32) for _ in range(hpb)]
    dgout_acc = [jnp.zeros((num_globals, head_dim), jnp.float32) for _ in range(hpb)]

    for i in range(nb):
        off, shift = offs[i]
        win_mask = _band_iota_mask(block_q, band, half, shift)
        key_ok = keyloc_ref[0, pl.ds(off, band), 0] != 0
        loc_mask = win_mask & key_ok[None, :]
        col_mask = jnp.concatenate(
            [loc_mask.astype(jnp.int32),
             jnp.broadcast_to(g_ok[None, :].astype(jnp.int32),
                              (block_q, num_globals))],
            axis=1) != 0
        if fuse_epilogue:
            mrow = mrow_ref[0, pl.ds(i * block_q, block_q), 0]  # (block_q,)
            is_glb = (mrow == 2)[:, None]
            is_loc = (mrow == 1)[:, None]
        for h in range(hpb):
            lo = h * head_dim
            q = q_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim]
            q = q * jnp.asarray(scale, in_dtype)
            k_band = k_ref[0, pl.ds(off, band), lo:lo + head_dim]
            v_band = v_ref[0, pl.ds(off, band), lo:lo + head_dim]
            kext = jnp.concatenate([k_band, gk_ref[0, :, lo:lo + head_dim]],
                                   axis=0)  # (band + G, D)
            vext = jnp.concatenate([v_band, gv_ref[0, :, lo:lo + head_dim]],
                                   axis=0)
            dout = dout_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim]
            if fuse_epilogue:
                # epilogue backward: global rows' upstream grad goes to
                # d(g_out); band-path grads see dout only at local rows
                dgout_acc[h] += jnp.sum(
                    jnp.where(is_glb, dout.astype(jnp.float32), 0.0),
                    axis=0, keepdims=True)
                dout = jnp.where(is_loc, dout, 0.0)
            dout = dout.astype(in_dtype)

            # recompute probabilities (operand-concat form, see _fwd_kernel)
            scores = jax.lax.dot_general(q, kext, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            scores = jnp.where(col_mask, scores, NEG_INF)
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
            p = e / denom  # (block_q, band + G)

            # dropout: regenerate the forward kernel's exact keep-mask.
            # out = (m . p) V with m = keep/(1-rate), so dL/dp = m . (dout V^T)
            # and dV = (m . p)^T dout; softmax backward then runs on the
            # *undropped* p with the masked upstream grad.
            if dropout_rate > 0.0:
                keep = _dropout_keep(seed_ref[0], pl.program_id(0),
                                     pl.program_id(1), i, h, nb, hpb,
                                     block_q, band + num_globals, dropout_rate)
                inv = 1.0 / (1.0 - dropout_rate)
                p_drop = jnp.where(keep, p * inv, 0.0)
            else:
                p_drop = p

            # softmax backward — single full-width dots over (band + G)
            dp = jax.lax.dot_general(dout, vext, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                dp = jnp.where(keep, dp * inv, 0.0)
            row_dot = jnp.sum(p * dp, axis=1, keepdims=True)
            ds = p * (dp - row_dot)  # (bq, band + G)

            ds_c = ds.astype(in_dtype)
            dq = jax.lax.dot_general(ds_c, kext, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dq_ref[0, pl.ds(i * block_q, block_q), lo:lo + head_dim] = (
                (dq * scale).astype(dq_ref.dtype))

            # one (band+G, D) dot each, then split rows into band / global
            dkext = jax.lax.dot_general(ds_c, q, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            dvext = jax.lax.dot_general(p_drop.astype(in_dtype), dout,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            cur_k = dk_scr[pl.ds(off, band), lo:lo + head_dim]
            dk_scr[pl.ds(off, band), lo:lo + head_dim] = cur_k + dkext[:band]
            cur_v = dv_scr[pl.ds(off, band), lo:lo + head_dim]
            dv_scr[pl.ds(off, band), lo:lo + head_dim] = cur_v + dvext[:band]

            dgk_acc[h] += dkext[band:]
            dgv_acc[h] += dvext[band:]

    dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)
    dgk_ref[0] = jnp.concatenate(dgk_acc, axis=1).astype(dgk_ref.dtype)
    dgv_ref[0] = jnp.concatenate(dgv_acc, axis=1).astype(dgv_ref.dtype)
    dgout_ref[0] = jnp.concatenate(dgout_acc, axis=1).astype(dgout_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers over (B, L, H*D)-shaped operands
# ---------------------------------------------------------------------------

def _grid_and_specs(B, L, HD, W, num_globals, num_heads):
    D = HD // num_heads
    hpb = _heads_per_block(num_heads, D)
    lane = hpb * D
    HP = num_heads // hpb
    blk = lambda b, hp: (b, 0, hp)
    row = lambda b, hp: (b, 0, 0)
    in_specs = [
        pl.BlockSpec((1, L, lane), blk),            # q
        pl.BlockSpec((1, L, lane), blk),            # k (unpadded)
        pl.BlockSpec((1, L, lane), blk),            # v (unpadded)
        pl.BlockSpec((1, L, 1), row),               # keyloc (shared per batch)
        pl.BlockSpec((1, num_globals, lane), blk),  # gk
        pl.BlockSpec((1, num_globals, lane), blk),  # gv
        pl.BlockSpec((1, 1, num_globals), row),     # gvalid
        pl.BlockSpec((1, L, 1), row),               # mrow (full {0,1,2} mask)
        pl.BlockSpec((1, num_globals, lane), blk),  # gout (compact global out)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # dropout seed (1,) int32
    ]
    return (B, HP), in_specs, blk, D, hpb, lane


def _band_core_fwd_call(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2,
                        gout2, seed, *, block_q, window, num_globals,
                        num_heads, interpret, dropout_rate, fuse_epilogue):
    B, L, HD = q2.shape
    nb = L // block_q
    W = window
    grid, in_specs, blk, D, hpb, lane = _grid_and_specs(
        B, L, HD, W, num_globals, num_heads)
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, window=window, num_globals=num_globals,
        scale=scale, nb=nb, hpb=hpb, head_dim=D, dropout_rate=dropout_rate,
        fuse_epilogue=fuse_epilogue, L=L,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, lane), blk),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q2.dtype),
        interpret=interpret,
    )(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2, seed)


def _band_core_bwd_call(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2,
                        gout2, seed, dout2, *, block_q, window, num_globals,
                        num_heads, interpret, dropout_rate, fuse_epilogue):
    B, L, HD = q2.shape
    nb = L // block_q
    W = window
    grid, in_specs, blk, D, hpb, lane = _grid_and_specs(
        B, L, HD, W, num_globals, num_heads)
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(
        _bwd_kernel, block_q=block_q, window=window, num_globals=num_globals,
        scale=scale, nb=nb, hpb=hpb, head_dim=D, dropout_rate=dropout_rate,
        fuse_epilogue=fuse_epilogue, L=L,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, L, HD), q2.dtype),          # dq
        jax.ShapeDtypeStruct((B, L, HD), q2.dtype),          # dk
        jax.ShapeDtypeStruct((B, L, HD), q2.dtype),          # dv
        jax.ShapeDtypeStruct((B, num_globals, HD), jnp.float32),  # dgk
        jax.ShapeDtypeStruct((B, num_globals, HD), jnp.float32),  # dgv
        jax.ShapeDtypeStruct((B, num_globals, HD), jnp.float32),  # dgout
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + [pl.BlockSpec((1, L, lane), blk)],  # dout
        out_specs=(
            pl.BlockSpec((1, L, lane), blk),
            pl.BlockSpec((1, L, lane), blk),
            pl.BlockSpec((1, L, lane), blk),
            pl.BlockSpec((1, num_globals, lane), blk),
            pl.BlockSpec((1, num_globals, lane), blk),
            pl.BlockSpec((1, num_globals, lane), blk),
        ),
        out_shape=out_shapes,
        # fp32 accumulators for the overlapping-band dK/dV live in scratch
        scratch_shapes=[pltpu.VMEM((L, lane), jnp.float32),
                        pltpu.VMEM((L, lane), jnp.float32)],
        interpret=interpret,
    )(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2, seed, dout2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def _band_core(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2,
               seed, block_q, window, num_globals, num_heads, interpret,
               dropout_rate, fuse_epilogue):
    return _band_core_fwd_call(q2, k2, v2, keyloc2, gk2, gv2, gvalid2,
                               mrow2, gout2, seed, block_q=block_q,
                               window=window, num_globals=num_globals,
                               num_heads=num_heads, interpret=interpret,
                               dropout_rate=dropout_rate,
                               fuse_epilogue=fuse_epilogue)


def _band_core_fwd(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2,
                   seed, block_q, window, num_globals, num_heads, interpret,
                   dropout_rate, fuse_epilogue):
    out = _band_core_fwd_call(q2, k2, v2, keyloc2, gk2, gv2, gvalid2,
                              mrow2, gout2, seed, block_q=block_q,
                              window=window, num_globals=num_globals,
                              num_heads=num_heads, interpret=interpret,
                              dropout_rate=dropout_rate,
                              fuse_epilogue=fuse_epilogue)
    return out, (q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2,
                 seed)


def _band_core_bwd(block_q, window, num_globals, num_heads, interpret,
                   dropout_rate, fuse_epilogue, res, dout):
    q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2, seed = res
    dq, dkpad, dvpad, dgk, dgv, dgout = _band_core_bwd_call(
        q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2, gout2, seed,
        dout.astype(q2.dtype),
        block_q=block_q, window=window, num_globals=num_globals,
        num_heads=num_heads, interpret=interpret, dropout_rate=dropout_rate,
        fuse_epilogue=fuse_epilogue,
    )
    return (dq.astype(q2.dtype), dkpad.astype(k2.dtype),
            dvpad.astype(v2.dtype), None,
            dgk.astype(gk2.dtype), dgv.astype(gv2.dtype), None, None,
            dgout.astype(gout2.dtype), None)


_band_core.defvjp(_band_core_fwd, _band_core_bwd)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("window", "block_q", "max_globals",
                                              "interpret", "dropout_rate"))
def pallas_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_g: jnp.ndarray,
    k_g: jnp.ndarray,
    v_g: jnp.ndarray,
    mask: jnp.ndarray,
    window: int,
    block_q: int = DEFAULT_BLOCK_Q,
    max_globals: int = 1,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    g_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Same contract as :func:`attention.dense_attention`; fused TPU kernel.

    Attention-probs dropout runs *inside* the kernel on the TPU hardware PRNG
    (no (B, H, L, band) mask tensor in HBM). The interpret backend has no
    PRNG primitives, so interpret-mode dropout falls back to the (same-math)
    XLA chunked implementation."""
    B, L, H, D = q.shape
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires a dropout_rng key")
    if interpret and dropout_rate > 0.0:
        import math

        from .attention import chunked_attention, scatter_global_rows

        if g_out is not None and g_out.shape[1] == max_globals != L:
            g_out = scatter_global_rows(g_out, mask, max_globals)
        return chunked_attention(q, k, v, q_g, k_g, v_g, mask, window,
                                 block=math.gcd(L, 128),
                                 max_globals=max_globals,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng, g_out=g_out)
    if dropout_rate > 0.0:
        rng_band, rng_glb = jax.random.split(dropout_rng)
        seed = jax.random.bits(rng_band, (1,), jnp.uint32).astype(jnp.int32)
    else:
        rng_glb = None
        seed = jnp.zeros((1,), jnp.int32)
    HD = H * D
    block_q = min(block_q, L)
    if L % block_q:
        raise ValueError(f"L={L} must be a multiple of block_q={block_q}")
    scale = 1.0 / jnp.sqrt(jnp.array(D, jnp.float32)).astype(q.dtype)
    # Contract: at most ``max_globals`` global rows per sequence (the data
    # pipeline emits exactly one, the <s> row). Out-of-contract extra
    # mask==2 rows are demoted to local here, so the fused epilogue (which
    # broadcasts the compact global output to every mask==2 row) and the
    # legacy scattered path see the same, well-defined mask.
    gidx0, gvalid0 = global_prefix_indices(mask, max_globals)
    b_idx0 = jnp.broadcast_to(jnp.arange(B)[:, None], gidx0.shape)
    kept_global = jnp.zeros(mask.shape, bool).at[b_idx0, gidx0].max(gvalid0)
    mask = jnp.where((mask == 2) & ~kept_global, 1, mask)
    is_pad = mask == 0
    is_global = mask == 2

    # (B, L, H, D) -> (B, L, H*D): minor-dim merge, a free reshape (no copy).
    # K/V stay UNPADDED — the kernel reads each band at a statically clamped
    # offset (window padding cost two full HBM copy passes per call).
    q2 = q.reshape(B, L, HD)
    k2 = k.reshape(B, L, HD)
    v2 = v.reshape(B, L, HD)
    keyloc2 = (mask == 1).astype(jnp.int32)[:, :, None]  # (B, L, 1)

    gidx, gvalid = global_prefix_indices(mask, max_globals)  # (B, G)
    gk2 = jnp.take_along_axis(k.reshape(B, L, HD), gidx[:, :, None], axis=1)
    gv2 = jnp.take_along_axis(v.reshape(B, L, HD), gidx[:, :, None], axis=1)
    gvalid2 = gvalid.astype(jnp.int32)[:, None, :]  # (B, 1, G)

    # The global-row overwrite + pad zeroing run INSIDE the kernel when
    # possible (G == 1, the model's only config): the alternative is two
    # (B, L, H, D) `where` passes over HBM plus the layout copies the 4-D
    # reshape forces (D=64 < the 128-lane tile). ``g_out`` may arrive in
    # compact (B, G, H, D) form (no scatter materialized at all) or in the
    # legacy scattered (B, L, H, D) form.
    compact_gout = g_out is not None and g_out.shape[1] == max_globals != L
    fuse = max_globals == 1 and (g_out is None or compact_gout)
    mrow2 = mask.astype(jnp.int32)[:, :, None]  # (B, L, 1) in {0,1,2}
    if fuse:
        if g_out is None:
            g_out = _global_rows(q_g, k_g, v_g, mask, scale, q.dtype,
                                 max_globals, dropout_rate, rng_glb,
                                 compact=True)
        gout2 = g_out.reshape(B, max_globals, HD).astype(q.dtype)
        out2 = _band_core(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2,
                          gout2, seed, block_q, window, max_globals, H,
                          interpret, float(dropout_rate), True)
        return out2.reshape(B, L, H, D).astype(q.dtype)

    gout2 = jnp.zeros((B, max_globals, HD), q.dtype)  # unused placeholder
    out2 = _band_core(q2, k2, v2, keyloc2, gk2, gv2, gvalid2, mrow2,
                      gout2, seed, block_q, window, max_globals, H, interpret,
                      float(dropout_rate), False)
    out = out2.reshape(B, L, H, D).astype(q.dtype)

    # global query rows (dedicated projections) + padding zeroing
    if g_out is None:
        g_out = _global_rows(q_g, k_g, v_g, mask, scale, q.dtype, max_globals,
                             dropout_rate, rng_glb)
    out = jnp.where(is_global[:, :, None, None], g_out, out)
    out = jnp.where(is_pad[:, :, None, None], 0.0, out)
    return out
