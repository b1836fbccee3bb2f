"""Recformer embeddings: word + token-position + token-type + item-position.

Reference semantics: ``/root/reference/recformer/models.py:68-153``.

- Token-position ids are *padding-aware*: position = cumulative count of
  non-pad tokens, offset by ``pad_token_id`` (positions start at
  ``pad_token_id + 1``; pad tokens sit at ``pad_token_id``). This reproduces
  ``create_position_ids_from_input_ids`` (``models.py:68-79``).
- The four embeddings are summed, LayerNormed, and dropped out — a single
  fused region XLA compiles into one pass over HBM.

Submodules are setup-defined (not compact) so ``word_embeddings`` is
addressable from the MLM head for weight tying (``Embed.attend``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import RecformerConfig


def create_position_ids_from_input_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _onehot_grad_lookup(table: jnp.ndarray, ids: jnp.ndarray, n: int) -> jnp.ndarray:
    """Embedding lookup whose backward is a one-hot matmul instead of a
    scatter-add. For tiny vocabularies (token-type 4, item-position 51) the
    profile shows XLA's scatter grad running at ~66 GB/s (~0.65 ms/step each)
    while the equivalent (M, n) one-hot GEMM is MXU work at a fraction of
    that. Math-identical: both sum dout rows per id in fp32."""
    return jnp.take(table, ids, axis=0)


def _onehot_grad_lookup_fwd(table, ids, n):
    return jnp.take(table, ids, axis=0), ids


def _onehot_grad_lookup_bwd(n, ids, dout):
    flat_ids = ids.reshape(-1)
    flat_dout = dout.reshape(-1, dout.shape[-1])
    oh = jax.nn.one_hot(flat_ids, n, dtype=flat_dout.dtype)  # (M, n)
    d = jax.lax.dot_general(oh, flat_dout, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return d.astype(dout.dtype), None


_onehot_grad_lookup.defvjp(_onehot_grad_lookup_fwd, _onehot_grad_lookup_bwd)


def _small_embed(embed_mod: nn.Embed, ids: jnp.ndarray, compute_dtype):
    """nn.Embed-equivalent lookup with the one-hot-GEMM gradient. Casting
    after the take is value-identical to flax's cast-before-take, and keeps
    the table cotangent in fp32 end to end (the astype VJP upcasts dout
    before it reaches the one-hot GEMM)."""
    table = embed_mod.embedding
    return _onehot_grad_lookup(table, ids, table.shape[0]).astype(compute_dtype)


class _LayerNormParams(nn.Module):
    """Bare scale/bias holder so the same parameters ('LayerNorm/{scale,bias}'
    in the tree, checkpoint-compatible) can feed either the XLA LN path or the
    fused Pallas sum+LN kernel."""

    features: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return scale, bias


class RecformerEmbeddings(nn.Module):
    config: RecformerConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        kw = dict(embedding_init=init, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size, **kw)
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, **kw)
        self.token_type_embeddings = nn.Embed(cfg.token_type_size, cfg.hidden_size, **kw)
        self.item_position_embeddings = nn.Embed(cfg.max_item_embeddings, cfg.hidden_size, **kw)
        self.LayerNorm = _LayerNormParams(cfg.hidden_size, cfg.params_dtype)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type_ids: jnp.ndarray,
        item_position_ids: jnp.ndarray,
        position_ids: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        if position_ids is None:
            position_ids = create_position_ids_from_input_ids(input_ids, cfg.pad_token_id)
        word = self.word_embeddings(input_ids)
        pos = self.position_embeddings(position_ids)
        # tiny-vocab tables: one-hot-GEMM gradient instead of scatter (the
        # big word/position tables keep the scatter — their one-hot would be
        # a (M, 50k) intermediate)
        typ = _small_embed(self.token_type_embeddings, token_type_ids,
                           cfg.compute_dtype)
        item = _small_embed(self.item_position_embeddings, item_position_ids,
                            cfg.compute_dtype)
        scale, bias = self.LayerNorm()

        if cfg.embed_ln_impl == "pallas":
            from ..ops.pallas_embed import fused_embed_layernorm

            x = fused_embed_layernorm(
                word, pos, typ, item, scale, bias, eps=cfg.layer_norm_eps
            ).astype(cfg.compute_dtype)
        else:
            x = (word + pos + typ + item).astype(jnp.float32)
            mu = jnp.mean(x, axis=-1, keepdims=True)
            xc = x - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            x = xc * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = x * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            x = x.astype(cfg.compute_dtype)
        return self.dropout(x, deterministic=deterministic)
