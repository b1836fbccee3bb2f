"""Longformer-style windowed + global attention, TPU-first.

Behavioral spec (re-derived from HF ``modeling_longformer.py`` as used by the
reference at ``/root/reference/recformer/models.py:12-18,335``):

Inputs carry a per-token mask with coding {0 = padding, 1 = local, 2 = global}
(``models.py:262-272``). Semantics:

- A *local* query at position i attends to (a) every global position and
  (b) local positions j with ``|i - j| <= window // 2``. Global positions are
  excluded from the windowed key set (they enter once, via (a)).
- A *global* query attends to every non-padding position, and uses a separate
  set of projections (q_g, k_g, v_g) — matching Longformer's dedicated global
  projections.
- Padding queries produce zeros; padding keys are never attended.
- Scores are scaled by ``1/sqrt(head_dim)``; softmax runs in float32.
- Training applies dropout to the post-softmax probabilities (HF
  ``attention_probs_dropout_prob``, default 0.1): pass ``dropout_rate`` and a
  ``dropout_rng`` key. Inverted dropout (kept entries scaled by 1/(1-rate)).

Implementations:

- :func:`dense_attention` — O(L^2) fully masked attention. Numerics oracle for
  tests and small shapes.
- :func:`chunked_attention` — banded sliding-chunks attention in pure XLA:
  keys are gathered into per-query-block bands of width ``block + window`` so
  every matmul is a static-shaped MXU op; global keys are appended as extra
  columns in the same softmax.
- the Pallas fused kernel lives in ``pallas_attention.py``.

All functions take q/k/v of shape ``(B, L, H, D)`` and mask ``(B, L)`` int32,
and return ``(B, L, H, D)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _prob_dropout(probs: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout on attention probabilities (fp32)."""
    if rate <= 0.0:
        return probs
    if rng is None:
        raise ValueError("dropout_rate > 0 requires a dropout_rng key")
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    return jnp.where(keep, probs / (1.0 - rate), 0.0)


def _split_masks(mask: jnp.ndarray):
    is_pad = mask == 0
    is_local = mask == 1
    is_global = mask == 2
    return is_pad, is_local, is_global


def global_prefix_indices(mask: jnp.ndarray, max_globals: int):
    """Indices of the first ``max_globals`` global positions per row, plus a
    validity flag. Vectorized over the batch; earliest positions win."""
    B, L = mask.shape
    is_global = (mask == 2).astype(jnp.float32)
    # Prefer earlier positions among globals: score = is_global - idx/L
    pos = jnp.arange(L, dtype=jnp.float32) / (2.0 * L)
    score = is_global - pos
    _, idx = jax.lax.top_k(score, max_globals)  # (B, G)
    valid = jnp.take_along_axis(mask, idx, axis=1) == 2
    return idx, valid


def scatter_global_rows(out_g, mask, max_globals: int):
    """(B, G, H, D) compact global-row outputs -> (B, L, H, D) with the
    values scattered at the global positions, zeros elsewhere."""
    B, L = mask.shape
    gidx, _ = global_prefix_indices(mask, max_globals)
    out = jnp.zeros((B, L) + out_g.shape[2:], out_g.dtype)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], gidx.shape)
    return out.at[b_idx, gidx].add(out_g)


def _global_rows(q_g, k_g, v_g, mask, scale, dtype, max_globals: int = 1,
                 dropout_rate: float = 0.0, dropout_rng=None,
                 compact: bool = False):
    """Full-attention output for global query rows, computed ONLY at the
    (at most ``max_globals``) global positions and scattered back: returns
    (B, L, H, D) where rows with mask==2 hold the global-attention output and
    every other row is zero (or the compact ``(B, G, H, D)`` form when
    ``compact=True`` — the Pallas kernel scatters in its epilogue instead).
    Avoids the O(L^2) score matrix a naive compute-all-rows version would
    materialize.

    ``q_g`` may be either the full-length global-query projection
    ``(B, L, H, D)`` or — the fast path the encoder uses — already gathered at
    the ``global_prefix_indices`` rows, ``(B, max_globals, H, D)``, so the
    query_global GEMM never runs over the ~L non-global positions."""
    B, L = mask.shape
    H, D = q_g.shape[2], q_g.shape[3]
    is_pad = mask == 0
    gidx, gvalid = global_prefix_indices(mask, max_globals)  # (B, G)
    if q_g.shape[1] == max_globals and max_globals != L:
        qg_sel = q_g  # pre-gathered (B, G, H, D)
    else:
        qg_sel = jnp.take_along_axis(q_g, gidx[:, :, None, None], axis=1)  # (B, G, H, D)
    scores = jnp.einsum(
        "bghd,bmhd->bhgm", qg_sel * scale, k_g, preferred_element_type=jnp.float32
    )  # (B, H, G, L)
    scores = jnp.where(is_pad[:, None, None, :], NEG_INF, scores)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = _prob_dropout(probs, dropout_rate, dropout_rng)
    out_g = jnp.einsum("bhgm,bmhd->bghd", probs.astype(dtype), v_g)  # (B, G, H, D)
    out_g = jnp.where(gvalid[:, :, None, None], out_g, 0.0)
    if compact:
        return out_g
    return scatter_global_rows(out_g, mask, max_globals)


def global_rows_thin(hidden, qg_sel, w_kg, b_kg, w_vg, b_vg, mask, dtype,
                     max_globals: int = 1, dropout_rate: float = 0.0,
                     dropout_rng=None, compact: bool = False):
    """Global-row attention WITHOUT materializing the full-length k_g/v_g
    projections. Same math as projecting ``k_g = hidden @ w_kg + b_kg`` (resp.
    v_g) and calling :func:`_global_rows`, reassociated so the per-layer
    ``(L, hs, hs)`` GEMMs collapse to N=heads-wide thin GEMMs:

        scores[l] = q_g . (hidden[l] @ W_kg)  =  hidden[l] . (W_kg^T q_g)
        out       = probs @ (hidden @ W_vg)   =  (probs @ hidden) @ W_vg

    The global rows are the ONLY consumers of those projections (the banded
    path's global key columns use the *local* k/v — HF Longformer semantics,
    reference dependency ``recformer/models.py:12-18``), so at G=1 global row
    this removes 2 of the 6 full-length projection GEMMs per layer (and their
    backward) at ~1/64 the FLOPs. Bitwise-identical dropout pattern to
    ``_global_rows`` (same draw shape and rng).

    ``hidden``: (B, L, hs); ``qg_sel``: (B, G, H, D) pre-gathered global
    queries (unscaled); ``w_kg``/``w_vg``: (hs, hs); ``b_kg``/``b_vg``: (hs,).
    Returns (B, L, H, D): global rows hold the attention output, rest zeros.
    """
    B, L = mask.shape
    H, D = qg_sel.shape[2], qg_sel.shape[3]
    scale = 1.0 / jnp.sqrt(jnp.array(D, jnp.float32)).astype(dtype)
    is_pad = mask == 0
    gidx, gvalid = global_prefix_indices(mask, max_globals)  # (B, G)
    qs = (qg_sel * scale).astype(dtype)
    # tiny per-global contractions run in fp32 (they are O(G*H*hs*D) — noise;
    # CPU XLA also lacks a bf16 dot thunk for these shapes)
    w_kg_h = w_kg.astype(dtype).astype(jnp.float32).reshape(-1, H, D)
    w_vg_h = w_vg.astype(dtype).astype(jnp.float32).reshape(-1, H, D)
    qs32 = qs.astype(jnp.float32)
    # r[e] = sum_d W_kg[e, h, d] * q[g, h, d]  -> tiny (B, G, H, hs)
    r = jnp.einsum("ehd,bghd->bghe", w_kg_h, qs32)
    # score bias from k_g's bias: b_kg . q per (g, h)
    sb = jnp.einsum("hd,bghd->bgh", b_kg.astype(jnp.float32).reshape(H, D),
                    qs32)
    scores = jnp.einsum("ble,bghe->bhgl", hidden.astype(dtype), r.astype(dtype),
                        preferred_element_type=jnp.float32)  # thin GEMM, N=G*H
    scores = scores + jnp.transpose(sb, (0, 2, 1))[:, :, :, None]
    scores = jnp.where(is_pad[:, None, None, :], NEG_INF, scores)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)  # (B, H, G, L)
    probs = _prob_dropout(probs, dropout_rate, dropout_rng)
    # out = (probs @ hidden) @ W_vg + b_vg * sum(probs)   [sum != 1 w/ dropout]
    # thin GEMM, M=G*H; dtype output like _global_rows' probs @ v_g (the MXU
    # still accumulates fp32 internally; CPU lacks a bf16->f32 dot thunk here)
    t = jnp.einsum("bhgl,ble->bghe", probs.astype(dtype), hidden.astype(dtype))
    out_g = jnp.einsum("bghe,ehd->bghd", t.astype(jnp.float32), w_vg_h)  # tiny
    psum = jnp.sum(probs, axis=-1)  # (B, H, G)
    out_g = out_g + (b_vg.astype(jnp.float32).reshape(1, 1, H, D)
                     * jnp.transpose(psum, (0, 2, 1))[:, :, :, None])
    out_g = out_g.astype(dtype)
    out_g = jnp.where(gvalid[:, :, None, None], out_g, 0.0)
    if compact:
        return out_g
    return scatter_global_rows(out_g, mask, max_globals)


def dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_g: jnp.ndarray,
    k_g: jnp.ndarray,
    v_g: jnp.ndarray,
    mask: jnp.ndarray,
    window: int,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    g_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """O(L^2) oracle implementation."""
    B, L, H, D = q.shape
    rng_loc = rng_glb = None
    if dropout_rate > 0.0:
        rng_loc, rng_glb = jax.random.split(dropout_rng)
    scale = 1.0 / jnp.sqrt(jnp.array(D, jnp.float32)).astype(q.dtype)
    is_pad, is_local, is_global = _split_masks(mask)
    half = window // 2

    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    in_window = jnp.abs(i - j) <= half  # (L, L)

    # local rows: keys = globals  U  (window & local)
    allowed = is_global[:, None, :] | (in_window[None, :, :] & is_local[:, None, :])
    scores = jnp.einsum("blhd,bmhd->bhlm", q * scale, k, preferred_element_type=jnp.float32)
    scores = jnp.where(allowed[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    # rows with no allowed keys (padding) -> zeros
    any_key = jnp.any(allowed, axis=-1)  # (B, L)
    probs = jnp.where(any_key[:, None, :, None], probs, 0.0)
    probs = _prob_dropout(probs, dropout_rate, rng_loc)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(q.dtype), v)

    if g_out is not None:
        pass  # precomputed global rows (global_rows_thin fast path)
    elif q_g.shape[1] != L:
        # pre-gathered (B, G, H, D) global queries (see _global_rows)
        g_out = _global_rows(q_g, k_g, v_g, mask, scale, q.dtype, q_g.shape[1],
                             dropout_rate, rng_glb)
    else:
        # oracle path: compute global rows for EVERY position (O(L^2), exact
        # for any number of globals), then select
        g_scores = jnp.einsum("blhd,bmhd->bhlm", q_g * scale, k_g,
                              preferred_element_type=jnp.float32)
        g_scores = jnp.where(is_pad[:, None, None, :], NEG_INF, g_scores)
        g_probs = jax.nn.softmax(g_scores.astype(jnp.float32), axis=-1)
        g_probs = _prob_dropout(g_probs, dropout_rate, rng_glb)
        g_out = jnp.einsum("bhlm,bmhd->blhd", g_probs.astype(q.dtype), v_g)
    out = jnp.where(is_global[:, :, None, None], g_out, out)
    out = jnp.where(is_pad[:, :, None, None], 0.0, out)
    return out


@functools.partial(jax.jit, static_argnames=("window", "block", "max_globals",
                                              "dropout_rate"))
def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_g: jnp.ndarray,
    k_g: jnp.ndarray,
    v_g: jnp.ndarray,
    mask: jnp.ndarray,
    window: int,
    block: int = 128,
    max_globals: int = 1,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    g_out: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Banded attention via sliding chunks, O(L * (block + window)).

    ``L`` must be a multiple of ``block``; ``window`` must be even and
    ``window // 2 <= block`` is not required (bands widen as needed).
    """
    B, L, H, D = q.shape
    if L % block:
        raise ValueError(f"L={L} must be a multiple of block={block}")
    half = window // 2
    nb = L // block
    band = block + 2 * half  # keys visible to one query block
    scale = 1.0 / jnp.sqrt(jnp.array(D, jnp.float32)).astype(q.dtype)
    is_pad, is_local, is_global = _split_masks(mask)

    # --- band gather: K/V and key metadata per query block -------------
    # key positions for block c: [c*block - half, c*block + block + half)
    kidx = (jnp.arange(nb) * block)[:, None] + jnp.arange(band)[None, :] - half  # (nb, band)
    kvalid_pos = (kidx >= 0) & (kidx < L)
    kidx_c = jnp.clip(kidx, 0, L - 1)

    def gather_band(x):  # (B, L, ...) -> (B, nb, band, ...)
        return jnp.take(x, kidx_c, axis=1)

    k_b = gather_band(k)  # (B, nb, band, H, D)
    v_b = gather_band(v)
    key_local = gather_band(is_local) & kvalid_pos[None]  # (B, nb, band)

    # relative-position mask inside the band: query t (abs pos c*block + t)
    # sees band column u (abs pos c*block + u - half) iff |t - (u - half)| <= half
    t = jnp.arange(block)[:, None]
    u = jnp.arange(band)[None, :]
    in_window = jnp.abs(t - (u - half)) <= half  # (block, band)

    band_allowed = key_local[:, :, None, :] & in_window[None, None]  # (B, nb, block, band)

    qb = q.reshape(B, nb, block, H, D)
    band_scores = jnp.einsum(
        "bnthd,bnuhd->bhntu", qb * scale, k_b, preferred_element_type=jnp.float32
    )  # (B, H, nb, block, band)
    band_scores = jnp.where(band_allowed[:, None], band_scores, NEG_INF)

    # --- global key columns -------------------------------------------
    gidx, gvalid = global_prefix_indices(mask, max_globals)  # (B, G)
    kg_sel = jnp.take_along_axis(k, gidx[:, :, None, None], axis=1)  # (B, G, H, D)
    vg_sel = jnp.take_along_axis(v, gidx[:, :, None, None], axis=1)
    g_scores = jnp.einsum(
        "bnthd,bghd->bhntg", qb * scale, kg_sel, preferred_element_type=jnp.float32
    )  # (B, H, nb, block, G)
    g_scores = jnp.where(gvalid[:, None, None, None, :], g_scores, NEG_INF)

    # --- joint softmax over [band | globals] ---------------------------
    scores = jnp.concatenate([band_scores, g_scores], axis=-1).astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(denom, 1e-30)
    rng_loc = rng_glb = None
    if dropout_rate > 0.0:
        rng_loc, rng_glb = jax.random.split(dropout_rng)
    probs = _prob_dropout(probs, dropout_rate, rng_loc)
    p_band, p_glob = probs[..., :band], probs[..., band:]

    out = jnp.einsum("bhntu,bnuhd->bnthd", p_band.astype(q.dtype), v_b)
    out = out + jnp.einsum("bhntg,bghd->bnthd", p_glob.astype(q.dtype), vg_sel)
    out = out.reshape(B, L, H, D)

    # --- global query rows + padding ----------------------------------
    if g_out is None:
        g_out = _global_rows(q_g, k_g, v_g, mask, scale, q.dtype, max_globals,
                             dropout_rate, rng_glb)
    out = jnp.where(is_global[:, :, None, None], g_out, out)
    out = jnp.where(is_pad[:, :, None, None], 0.0, out)
    return out
