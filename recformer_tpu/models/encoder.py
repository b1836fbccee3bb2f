"""Longformer-style transformer encoder in flax.

Re-implements the behavioral contract of HF's ``LongformerEncoder`` as used by
the reference backbone (``/root/reference/recformer/models.py:335-343``):
post-LayerNorm transformer blocks whose self-attention is windowed + global
(see ``recformer_tpu/ops/attention.py``), with dedicated global-attention
projections, per-layer attention windows, and fp32 softmax.

The attention implementation is selected by ``config.attention_impl``
('dense' oracle / 'chunked' XLA / 'pallas' fused kernel).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import RecformerConfig
from ..ops.attention import (chunked_attention, dense_attention,
                             global_prefix_indices, global_rows_thin)

# The data contract has exactly one global token per sequence (the <s>/CLS
# row, tokenization sets global_attention_mask=[1,0,...]; reference
# tokenization.py:98-99) — matching the attention ops' max_globals default.
_MAX_GLOBALS = 1


def activation(hidden_act: str):
    """Activation selected by ``config.hidden_act``. 'gelu' is HF's exact
    erf GELU; 'gelu_tanh' is the tanh approximation (the ``base()`` recipe
    default: XLA's erf costs +124% on the fused FFN-up GEMM on v5e while
    tanh fuses ~free — docs/PERF.md epilogue bench)."""
    if hidden_act == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if hidden_act == "gelu_tanh":
        return lambda x: nn.gelu(x, approximate=True)
    if hidden_act == "relu":
        return nn.relu
    raise ValueError(f"unknown hidden_act {hidden_act!r}")


class _ProjWeights(nn.Module):
    """Raw (kernel, bias) with the exact param tree of an ``nn.Dense`` of the
    same name — so ``global_kv_mode`` flips freely on one checkpoint."""

    config: RecformerConfig

    @nn.compact
    def __call__(self):
        cfg = self.config
        kernel = self.param("kernel", nn.initializers.normal(cfg.initializer_range),
                            (cfg.hidden_size, cfg.hidden_size), cfg.params_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (cfg.hidden_size,), cfg.params_dtype)
        return kernel, bias


class LongformerSelfAttention(nn.Module):
    config: RecformerConfig
    window: int

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        B, L, _ = hidden.shape
        H, D = cfg.num_attention_heads, cfg.head_dim
        dtype = cfg.compute_dtype
        init = nn.initializers.normal(cfg.initializer_range)

        def proj(name):
            return nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                            param_dtype=cfg.params_dtype, name=name)

        def heads(x):
            return x.reshape(B, L, H, D)

        q = heads(proj("query")(hidden))
        k = heads(proj("key")(hidden))
        v = heads(proj("value")(hidden))
        # sequence_parallel shards the full-length k_g/v_g tensors, so it
        # needs global_kv_mode='full'; everything else defaults to the thin
        # reassociated path (see global_rows_thin) that never materializes them.
        thin_global = (cfg.global_kv_mode == "thin"
                       and cfg.attention_impl != "sequence_parallel")
        if thin_global:
            w_kg, b_kg = _ProjWeights(cfg, name="key_global")()
            w_vg, b_vg = _ProjWeights(cfg, name="value_global")()
            k_g = v_g = None
        else:
            k_g = heads(proj("key_global")(hidden))
            v_g = heads(proj("value_global")(hidden))

        # query_global projects ONLY the gathered global rows: the attention
        # ops read global queries at the (<= max_globals, here 1) global
        # positions (attention._global_rows), so projecting all L positions
        # would waste a full (L, hs, hs) GEMM per layer. (An A/B of instead
        # fusing the remaining five projections into one 768->3840 GEMM via
        # runtime kernel concat measured SLOWER end to end — 41.5-42.8 vs
        # 43.3 ex/s/chip — the per-scan-iteration weight concat costs more
        # than the wider GEMM saves; see docs/PERF.md.)
        gidx, _ = global_prefix_indices(mask, _MAX_GLOBALS)  # (B, G)
        hid_g = jnp.take_along_axis(hidden, gidx[:, :, None], axis=1)  # (B, G, hs)
        q_g = proj("query_global")(hid_g).reshape(B, _MAX_GLOBALS, H, D)

        # attention-probs dropout (HF attention_probs_dropout_prob semantics)
        drop_rate = 0.0 if deterministic else cfg.attention_probs_dropout_prob
        drop_rng = self.make_rng("dropout") if drop_rate > 0.0 else None

        g_out = None
        if thin_global:
            # every impl splits drop_rng the same way and uses part [1] for
            # the global rows; replicate that split so the dropout pattern is
            # bitwise-identical to the 'full' path
            rng_glb = (jax.random.split(drop_rng)[1]
                       if drop_rate > 0.0 else None)
            g_out = global_rows_thin(hidden, q_g, w_kg, b_kg, w_vg, b_vg,
                                     mask, dtype, _MAX_GLOBALS,
                                     drop_rate, rng_glb,
                                     # pallas scatters the global rows in its
                                     # kernel epilogue — skip the (B,L,H,D)
                                     # scatter entirely
                                     compact=(cfg.attention_impl == "pallas"))

        if cfg.attention_impl == "dense":
            out = dense_attention(q, k, v, q_g, k_g, v_g, mask, self.window,
                                  dropout_rate=drop_rate, dropout_rng=drop_rng,
                                  g_out=g_out)
        elif cfg.attention_impl == "chunked":
            block = min(128, L)
            out = chunked_attention(q, k, v, q_g, k_g, v_g, mask, self.window,
                                    block=block, dropout_rate=drop_rate,
                                    dropout_rng=drop_rng, g_out=g_out)
        elif cfg.attention_impl == "pallas":
            from ..ops.pallas_attention import pallas_window_attention

            interpret = jax.default_backend() != "tpu"
            if cfg.attention_head_shard_axis:
                # tensor parallelism: run the (GSPMD-opaque) kernel inside a
                # shard_map over the head axis — each shard computes its
                # local heads' bands/globals independently
                out = _head_sharded_pallas(cfg, q, k, v, q_g, k_g, v_g, g_out,
                                           mask, self.window, drop_rate,
                                           drop_rng, interpret)
            else:
                out = pallas_window_attention(q, k, v, q_g, k_g, v_g, mask,
                                              self.window, dropout_rate=drop_rate,
                                              dropout_rng=drop_rng, g_out=g_out,
                                              interpret=interpret)
        elif cfg.attention_impl == "sequence_parallel":
            # context-parallel halo attention: this forward must be running
            # inside shard_map with dim 1 (tokens) sharded on cfg.sequence_axis
            from ..parallel.sequence import sequence_parallel_attention

            out = sequence_parallel_attention(
                q, k, v, q_g, k_g, v_g, mask, self.window,
                axis_name=cfg.sequence_axis, dropout_rate=drop_rate,
                dropout_rng=drop_rng)
        else:  # pragma: no cover
            raise ValueError(cfg.attention_impl)

        # Named for selective remat: remat_policy='save_attention' saves this
        # value so the backward recompute never re-runs the attention kernel
        # (identity op otherwise).
        return checkpoint_name(
            out.reshape(B, L, cfg.hidden_size), "attn_out")


def _head_sharded_pallas(cfg, q, k, v, q_g, k_g, v_g, g_out, mask, window,
                         drop_rate, drop_rng, interpret=False):
    """Fused Pallas attention under tensor parallelism: shard_map over the
    head dim (``cfg.attention_head_shard_axis``). Heads are independent in
    the kernel, so each shard runs it on its local slice; the column-parallel
    q/k/v projections already produce head-sharded tensors, so the specs
    below match the incoming GSPMD placement (no resharding). Dropout folds
    the shard index into the rng so head groups are decorrelated.

    Requires an ambient mesh: callers enter ``jax.set_mesh(mesh)``."""
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_attention import pallas_window_attention

    axis = cfg.attention_head_shard_axis
    hs = P(None, None, axis, None)
    have_rng = drop_rate > 0.0
    rng_arg = drop_rng if have_rng else jax.random.PRNGKey(0)

    if g_out is not None:  # thin-global path: compact (B, G, H, D) epilogue
        def kern(q, k, v, g_out, mask, rng):
            r = jax.random.fold_in(rng, jax.lax.axis_index(axis)) if have_rng else None
            return pallas_window_attention(
                q, k, v, None, None, None, mask, window, interpret=interpret,
                dropout_rate=drop_rate, dropout_rng=r, g_out=g_out)

        return jax.shard_map(kern, mesh=None,
                             in_specs=(hs, hs, hs, hs, P(), P()),
                             out_specs=hs, check_vma=False)(
            q, k, v, g_out.astype(q.dtype), mask, rng_arg)

    def kern_full(q, k, v, q_g, k_g, v_g, mask, rng):
        r = jax.random.fold_in(rng, jax.lax.axis_index(axis)) if have_rng else None
        return pallas_window_attention(
            q, k, v, q_g, k_g, v_g, mask, window, interpret=interpret,
            dropout_rate=drop_rate, dropout_rng=r)

    return jax.shard_map(kern_full, mesh=None,
                         in_specs=(hs, hs, hs, hs, hs, hs, P(), P()),
                         out_specs=hs, check_vma=False)(
        q, k, v, q_g, k_g, v_g, mask, rng_arg)


def _block_layernorm(cfg, x):
    """Residual-sum LayerNorm for encoder blocks: nn.LayerNorm, or the
    jnp-forward / Pallas-backward variant (ln_impl='pallas_bwd' — same param
    tree, same math; see ops/pallas_layernorm.py)."""
    if cfg.ln_impl == "pallas_bwd":
        from ..models.embeddings import _LayerNormParams
        from ..ops.pallas_layernorm import pallas_layernorm

        scale, bias = _LayerNormParams(cfg.hidden_size, cfg.params_dtype,
                                       name="output_LayerNorm")()
        interpret = jax.default_backend() != "tpu"
        return pallas_layernorm(x.astype(cfg.compute_dtype),
                                scale, bias, cfg.layer_norm_eps, interpret)
    if cfg.ln_impl == "split_bwd":
        from ..models.embeddings import _LayerNormParams
        from ..ops.pallas_layernorm import split_layernorm

        scale, bias = _LayerNormParams(cfg.hidden_size, cfg.params_dtype,
                                       name="output_LayerNorm")()
        return split_layernorm(x.astype(cfg.compute_dtype),
                               scale, bias, cfg.layer_norm_eps)
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype,
                        param_dtype=cfg.params_dtype,
                        name="output_LayerNorm")(x)


class AttentionBlock(nn.Module):
    config: RecformerConfig
    window: int

    @nn.compact
    def __call__(self, hidden, mask, deterministic=True):
        cfg = self.config
        attn = LongformerSelfAttention(cfg, self.window, name="self")(
            hidden, mask, deterministic
        )
        dense = nn.Dense(cfg.hidden_size, kernel_init=nn.initializers.normal(cfg.initializer_range),
                         dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype, name="output_dense")
        out = dense(attn)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = _block_layernorm(cfg, out + hidden)
        return out


class FeedForwardBlock(nn.Module):
    config: RecformerConfig

    @nn.compact
    def __call__(self, hidden, deterministic=True):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        x = nn.Dense(cfg.intermediate_size, kernel_init=init, dtype=cfg.compute_dtype,
                     param_dtype=cfg.params_dtype, name="intermediate_dense")(hidden)
        x = activation(cfg.hidden_act)(x)
        x = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=cfg.compute_dtype,
                     param_dtype=cfg.params_dtype, name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        x = _block_layernorm(cfg, x + hidden)
        return x


class EncoderLayer(nn.Module):
    config: RecformerConfig
    window: int

    @nn.compact
    def __call__(self, hidden, mask, deterministic=True):
        hidden = AttentionBlock(self.config, self.window, name="attention")(
            hidden, mask, deterministic
        )
        hidden = FeedForwardBlock(self.config, name="ffn")(hidden, deterministic)
        return hidden


class _LayerForScan(nn.Module):
    """Scan adapter: carry = hidden states; mask/deterministic broadcast."""

    config: RecformerConfig
    window: int
    deterministic: bool

    @nn.compact
    def __call__(self, hidden, mask):
        hidden = EncoderLayer(self.config, self.window, name="layer")(
            hidden, mask, self.deterministic
        )
        return hidden, None


def _remat_policy(cfg: RecformerConfig):
    """jax.checkpoint policy selected by ``config.remat_policy`` (see the
    config field doc for the trade-offs)."""
    if cfg.remat_policy == "save_attention":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "dots_attn":
        # save every GEMM output AND the attention-kernel output: backward
        # recomputes only elementwise ops (GELU/LN/dropout) — near-unrolled
        # speed at scan_layers' compile time, if the residuals fit HBM
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("attn_out"))
    return None  # 'full': recompute everything


class LongformerEncoder(nn.Module):
    config: RecformerConfig

    @nn.compact
    def __call__(self, hidden, mask, deterministic=True):
        cfg = self.config
        if cfg.scan_layers:
            # stacked layers iterated with lax.scan: same math, ~L x smaller
            # XLA program. Params live under encoder/layers/layer/... with a
            # leading (num_layers,) axis.
            scan_cls = _LayerForScan
            if cfg.remat:
                scan_cls = nn.remat(
                    _LayerForScan,
                    prevent_cse=False,
                    static_argnums=(),
                    policy=_remat_policy(cfg),
                )
            scanned = nn.scan(
                scan_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_hidden_layers,
                in_axes=(nn.broadcast,),
                unroll=cfg.scan_unroll,
            )(cfg, cfg.attention_window[0], deterministic, name="layers")
            hidden, _ = scanned(hidden, mask)
            return hidden
        layer_cls = EncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,),
                                 policy=_remat_policy(cfg))
        for i, window in enumerate(cfg.attention_window):
            hidden = layer_cls(cfg, window, name=f"layer_{i}")(
                hidden, mask, deterministic
            )
        return hidden
