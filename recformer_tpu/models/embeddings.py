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
import jax.numpy as jnp

from ..config import RecformerConfig


def create_position_ids_from_input_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


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
        self.LayerNorm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype
        )
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
        x = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
            + self.item_position_embeddings(item_position_ids)
        )
        x = self.LayerNorm(x)
        return self.dropout(x, deterministic=deterministic)
