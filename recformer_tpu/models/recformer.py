"""Recformer backbone: embeddings -> Longformer encoder -> pooler.

Reference: ``/root/reference/recformer/models.py:174-356``. Differences by
design (TPU-first):

- No dynamic ``_pad_to_window_size``: batches are statically padded to
  ``config.max_token_num`` (or ``config.item_seq_len`` for the item tower),
  both validated to be multiples of the attention window at config time.
- Mask merging (``{0,1} x {0,1} -> {0,1,2}``) happens in pure jnp
  (``models.py:262-272`` semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import RecformerConfig
from .embeddings import RecformerEmbeddings
from .encoder import LongformerEncoder


def merge_attention_masks(attention_mask: jnp.ndarray, global_attention_mask: jnp.ndarray):
    """{0,1} local mask x {0,1} global mask -> {0 none, 1 local, 2 global}."""
    return attention_mask * (global_attention_mask + 1)


class RecformerPooler(nn.Module):
    config: RecformerConfig

    def __call__(self, merged_mask: jnp.ndarray, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.config.pooler_type == "cls":
            return hidden[:, 0]
        # 'avg': mask-weighted mean. NOTE reference quirk preserved: the
        # weights are the *merged* mask values, so the global CLS token gets
        # weight 2 (``models.py:160-171`` receives the merged mask).
        w = merged_mask.astype(hidden.dtype)
        return (hidden * w[:, :, None]).sum(1) / jnp.maximum(w.sum(-1), 1e-6)[:, None]


class RecformerModel(nn.Module):
    config: RecformerConfig

    def setup(self):
        self.embeddings = RecformerEmbeddings(self.config)
        self.encoder = LongformerEncoder(self.config)
        self.pooler = RecformerPooler(self.config)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        global_attention_mask: jnp.ndarray,
        token_type_ids: jnp.ndarray,
        item_position_ids: jnp.ndarray,
        position_ids: jnp.ndarray | None = None,
        deterministic: bool = True,
    ):
        mask = merge_attention_masks(attention_mask, global_attention_mask)
        x = self.embeddings(
            input_ids=input_ids,
            token_type_ids=token_type_ids,
            item_position_ids=item_position_ids,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        x = self.encoder(x, mask, deterministic)
        pooled = self.pooler(mask, x)
        return x, pooled
