"""Task heads: pretraining (contrastive + MLM), sequential recommendation,
fraud detection.

Reference: ``/root/reference/recformer/models.py:358-713``. TPU-first changes:

- The MLM head evaluates logits only at *gathered masked positions* (static
  ``(B, P)`` index arrays) instead of materializing ``(B, L, vocab)`` logits —
  a large memory/compute win the GPU reference does not have
  (``models.py:501-509`` runs the LM head over the full sequence).
- The decoder is weight-tied to the word embeddings (HF
  ``tie_word_embeddings=True`` behavior) via ``nn.Embed.attend``.
- The item-view tower in pretraining runs at its own short static length.
- The frozen item-embedding table for seq-rec is *not* a model parameter: it
  is produced by the item-encoding service and passed into the loss/scoring
  functions, reproducing the reference's always-frozen
  ``init_item_embedding`` semantics (``models.py:533-537``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import RecformerConfig
from .encoder import activation
from .recformer import RecformerModel


def cosine_similarity(x: jnp.ndarray, y: jnp.ndarray, axis: int = -1, eps: float = 1e-8):
    """Cosine similarity matching torch.nn.CosineSimilarity semantics
    (``models.py:358-369``)."""
    xn = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    yn = jnp.maximum(jnp.linalg.norm(y, axis=axis, keepdims=True), eps)
    return jnp.sum((x / xn) * (y / yn), axis=axis)


def similarity_scores(pooled: jnp.ndarray, item_embeddings: jnp.ndarray, temp: float):
    """Cosine/temp scores of ``(B, H)`` sequence embeddings against an
    ``(N, H)`` catalog (or ``(B, C, H)`` per-example candidates).
    Reference: ``models.py:539-545``."""
    p = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)
    e = item_embeddings / jnp.maximum(
        jnp.linalg.norm(item_embeddings, axis=-1, keepdims=True), 1e-8
    )
    if item_embeddings.ndim == 2:  # full catalog
        scores = jnp.einsum("bh,nh->bn", p, e, preferred_element_type=jnp.float32)
    else:  # per-example candidates
        scores = jnp.einsum("bh,bch->bc", p, e, preferred_element_type=jnp.float32)
    return scores / temp


class MLMTransform(nn.Module):
    """LM head transform (dense -> gelu -> LayerNorm) + tied decoder bias.

    Mirrors HF ``LongformerLMHead``; the decoder matmul itself happens in
    :meth:`RecformerForPretraining.mlm_logits` via ``Embed.attend``."""

    config: RecformerConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        self.dense = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=cfg.compute_dtype,
                              param_dtype=cfg.params_dtype)
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype,
                                       param_dtype=cfg.params_dtype)
        self.bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,), cfg.params_dtype)

    def __call__(self, hidden):
        x = self.dense(hidden)
        x = activation(self.config.hidden_act)(x)
        return self.layer_norm(x)


class PretrainForwardOutput(NamedTuple):
    z1: jnp.ndarray  # (B, H) pooled sequence-view embeddings
    z2: jnp.ndarray  # (B, H) pooled item-view embeddings
    mlm_logits_a: Optional[jnp.ndarray]  # (B, P_a, vocab) at masked positions
    mlm_logits_b: Optional[jnp.ndarray]  # (B, P_b, vocab)


class RecformerForPretraining(nn.Module):
    """Dual-tower forward (+ optional MLM towers): up to 4 encoder passes per
    step, exactly like the reference (``models.py:382-520``), but the b-view
    (single target item) runs at ``config.item_seq_len`` static length."""

    config: RecformerConfig

    def setup(self):
        self.longformer = RecformerModel(self.config)
        self.lm_head = MLMTransform(self.config)

    def encode(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        _, pooled = self.longformer(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            global_attention_mask=batch["global_attention_mask"],
            token_type_ids=batch["token_type_ids"],
            item_position_ids=batch["item_position_ids"],
            deterministic=deterministic,
        )
        return pooled

    def mlm_logits(
        self,
        mlm_input_ids: jnp.ndarray,
        batch: Dict[str, jnp.ndarray],
        mlm_positions: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Encoder pass on corrupted ids; logits only at ``mlm_positions``."""
        hidden, _ = self.longformer(
            input_ids=mlm_input_ids,
            attention_mask=batch["attention_mask"],
            global_attention_mask=batch["global_attention_mask"],
            token_type_ids=batch["token_type_ids"],
            item_position_ids=batch["item_position_ids"],
            deterministic=deterministic,
        )
        gathered = jnp.take_along_axis(hidden, mlm_positions[:, :, None], axis=1)  # (B, P, H)
        h = self.lm_head(gathered)
        logits = self.longformer.embeddings.word_embeddings.attend(h)
        return logits.astype(jnp.float32) + self.lm_head.bias.astype(jnp.float32)

    def _tower(self, batch: Dict[str, jnp.ndarray], deterministic: bool):
        """One view's clean + MLM-corrupted encoder passes, fused into a
        single (2B, L) forward when MLM inputs are present. The reference
        runs them as two separate passes (``models.py:411-469``); batching
        them doubles the matmul batch for better MXU utilization and halves
        kernel launches at identical math."""
        if "mlm_input_ids" not in batch:
            return self.encode(batch, deterministic), None
        if not self.config.fuse_mlm_pass:
            z = self.encode(batch, deterministic)
            logits = self.mlm_logits(batch["mlm_input_ids"], batch,
                                     batch["mlm_positions"], deterministic)
            return z, logits

        def dup(x):
            return jnp.concatenate([x, x], axis=0)

        ids2 = jnp.concatenate([batch["input_ids"], batch["mlm_input_ids"]], axis=0)
        hidden, pooled = self.longformer(
            input_ids=ids2,
            attention_mask=dup(batch["attention_mask"]),
            global_attention_mask=dup(batch["global_attention_mask"]),
            token_type_ids=dup(batch["token_type_ids"]),
            item_position_ids=dup(batch["item_position_ids"]),
            deterministic=deterministic,
        )
        B = batch["input_ids"].shape[0]
        z = pooled[:B]
        mlm_hidden = hidden[B:]
        gathered = jnp.take_along_axis(mlm_hidden, batch["mlm_positions"][:, :, None], axis=1)
        h = self.lm_head(gathered)
        logits = self.longformer.embeddings.word_embeddings.attend(h)
        return z, logits.astype(jnp.float32) + self.lm_head.bias.astype(jnp.float32)

    def __call__(
        self,
        batch_a: Dict[str, jnp.ndarray],
        batch_b: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> PretrainForwardOutput:
        z1, mlm_logits_a = self._tower(batch_a, deterministic)
        z2, mlm_logits_b = self._tower(batch_b, deterministic)
        return PretrainForwardOutput(z1, z2, mlm_logits_a, mlm_logits_b)


class RecformerForSeqRec(nn.Module):
    """Sequence encoder for finetune/serving. Scoring against the (frozen,
    externally supplied) item-embedding table happens in
    ``training/losses.py`` / ``parallel/catalog.py``."""

    config: RecformerConfig

    def setup(self):
        self.longformer = RecformerModel(self.config)

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        _, pooled = self.longformer(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            global_attention_mask=batch["global_attention_mask"],
            token_type_ids=batch["token_type_ids"],
            item_position_ids=batch["item_position_ids"],
            deterministic=deterministic,
        )
        return pooled


class RecformerForFraudDetection(nn.Module):
    """Backbone -> dropout -> 3-layer MLP -> scalar logit
    (``models.py:633-713``)."""

    config: RecformerConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        self.longformer = RecformerModel(cfg)
        self.pre_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        h = cfg.hidden_size
        kw = dict(kernel_init=init, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.fc1 = nn.Dense(h // 2, **kw)
        self.fc2 = nn.Dense(h // 4, **kw)
        self.fc3 = nn.Dense(1, **kw)
        self.mlp_dropout = nn.Dropout(0.2)

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        _, pooled = self.longformer(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            global_attention_mask=batch["global_attention_mask"],
            token_type_ids=batch["token_type_ids"],
            item_position_ids=batch["item_position_ids"],
            deterministic=deterministic,
        )
        x = self.pre_dropout(pooled, deterministic=deterministic)
        x = nn.relu(self.fc1(x))
        x = self.mlp_dropout(x, deterministic=deterministic)
        x = nn.relu(self.fc2(x))
        x = self.mlp_dropout(x, deterministic=deterministic)
        return self.fc3(x)[..., 0]
