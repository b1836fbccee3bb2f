"""Device-side batch construction: sequence assembly, pair sampling, MLM.

The reference builds every batch on the host in Python — per-example token
concatenation (``/root/reference/collator.py:71-90``), target sampling
(``collator.py:54-68, 278-292``) and string-based whole-word masking
(``collator.py:92-210``). TPU-first, all of it happens **on device** under
``jit`` as static-shaped gather/scatter + PRNG ops: the host ships only
``(B, max_items)`` item-id arrays; the packed :class:`ItemTable` lives in HBM.

Semantics preserved (and tested against the host reference path):

- newest-first item reversal with oldest-items-dropped truncation;
- token-stream truncation at exactly ``max_token_num`` (mid-item);
- padding conventions (pad id / item-pos ``max_item_embeddings-1`` / type 3);
- pretrain target sampled uniformly from the second half
  (``start=(len-1)//2``), finetune target uniform over the whole sequence
  (including position 0 -> empty history, the reference's ``start=min(len,0)``
  quirk at ``collator.py:287``);
- whole-word masking: words shuffled, greedily taken while the budget
  ``round(0.15 * n_tokens)`` allows, oversized words skipped but later words
  still considered; 80/10/10 corruption; ``-100`` non-labels.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import RecformerConfig

IGNORE_INDEX = -100


def _exclusive_cumsum(x, axis):
    c = jnp.cumsum(x, axis=axis)
    return c - x


# ---------------------------------------------------------------------------
# Sequence assembly
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_len", "max_items", "pad_token_id",
                                             "bos_token_id", "max_item_embeddings"))
def assemble_sequences(
    table: Dict[str, jnp.ndarray],
    item_ids: jnp.ndarray,  # (B, S_in) chronological [past ... present]
    seq_lens: jnp.ndarray,  # (B,)
    *,
    out_len: int,
    max_items: int,
    pad_token_id: int,
    bos_token_id: int,
    max_item_embeddings: int,
) -> Dict[str, jnp.ndarray]:
    """Build model-ready input arrays from item-id sequences.

    ``max_items`` is the item-count cap (``max_item_embeddings - 1``);
    ``out_len`` the static output token length.
    """
    B, S_in = item_ids.shape
    S = max_items
    M = table["token_ids"].shape[1]
    null_item = table["token_ids"].shape[0] - 1

    # newest-first: slot s holds the item at chronological index len-1-s
    slot = jnp.arange(S)[None, :]  # (1, S)
    src = seq_lens[:, None] - 1 - slot  # (B, S)
    valid_slot = src >= 0
    src_c = jnp.clip(src, 0, S_in - 1)
    ids = jnp.take_along_axis(item_ids, src_c, axis=1)
    ids = jnp.where(valid_slot, ids, null_item)

    tok = table["token_ids"][ids]  # (B, S, M)
    typ = table["token_types"][ids]
    beg = table["word_begin"][ids]
    lens = table["lengths"][ids] * valid_slot  # (B, S)

    starts = 1 + _exclusive_cumsum(lens, axis=1)  # (B, S); +1 for <s>
    pos_in_item = jnp.arange(M)[None, None, :]  # (1, 1, M)
    tok_valid = pos_in_item < lens[:, :, None]
    dest = starts[:, :, None] + pos_in_item  # (B, S, M)
    # invalid or truncated tokens land in the overflow slot ``out_len``
    dest = jnp.where(tok_valid, jnp.minimum(dest, out_len), out_len)

    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], dest.shape)
    flat_b = b_idx.reshape(-1)
    flat_dest = dest.reshape(-1)

    def scatter(fill_value, values, dtype=jnp.int32):
        out = jnp.full((B, out_len + 1), fill_value, dtype)
        out = out.at[flat_b, flat_dest].set(values.reshape(-1))
        return out[:, :out_len]

    item_pos_vals = jnp.broadcast_to((slot + 1)[:, :, None], dest.shape)

    input_ids = scatter(pad_token_id, tok).at[:, 0].set(bos_token_id)
    token_type_ids = scatter(3, typ).at[:, 0].set(0)
    word_begin = scatter(0, beg).at[:, 0].set(0)
    item_position_ids = scatter(max_item_embeddings - 1, item_pos_vals).at[:, 0].set(0)
    ones = jnp.ones_like(dest)
    attention_mask = scatter(0, ones).at[:, 0].set(1)
    global_attention_mask = jnp.zeros((B, out_len), jnp.int32).at[:, 0].set(1)
    # sequences longer than out_len: every position is filled, mask stays 1 —
    # scatter only wrote 1s at kept positions, so nothing more to do.

    return {
        "input_ids": input_ids,
        "item_position_ids": item_position_ids,
        "token_type_ids": token_type_ids,
        "attention_mask": attention_mask,
        "global_attention_mask": global_attention_mask,
        "word_begin": word_begin,
    }


def assemble_for_config(table, item_ids, seq_lens, config: RecformerConfig,
                        out_len: int | None = None, pad_token_id: int | None = None,
                        bos_token_id: int | None = None):
    return assemble_sequences(
        table,
        item_ids,
        seq_lens,
        out_len=out_len if out_len is not None else config.max_token_num,
        max_items=config.max_item_embeddings - 1,
        pad_token_id=config.pad_token_id if pad_token_id is None else pad_token_id,
        bos_token_id=config.bos_token_id if bos_token_id is None else bos_token_id,
        max_item_embeddings=config.max_item_embeddings,
    )


# ---------------------------------------------------------------------------
# Target sampling
# ---------------------------------------------------------------------------

def sample_pretrain_pairs(rng: jax.Array, seq_lens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pretrain pair sampling (``collator.py:54-68``): target position uniform
    over the *second half* ``[(len-1)//2, len-1]``. Returns
    (prefix_len = target_pos, target_pos)."""
    start = (seq_lens - 1) // 2
    u = jax.random.uniform(rng, seq_lens.shape)
    span = (seq_lens - start).astype(jnp.float32)
    target_pos = start + jnp.floor(u * span).astype(jnp.int32)
    target_pos = jnp.minimum(target_pos, seq_lens - 1)
    return target_pos, target_pos


def sample_finetune_targets(rng: jax.Array, seq_lens: jnp.ndarray) -> jnp.ndarray:
    """Finetune target uniform over the whole sequence — position 0 included,
    i.e. empty history (reference quirk at ``collator.py:287``)."""
    u = jax.random.uniform(rng, seq_lens.shape)
    target_pos = jnp.floor(u * seq_lens.astype(jnp.float32)).astype(jnp.int32)
    return jnp.minimum(target_pos, seq_lens - 1)


# ---------------------------------------------------------------------------
# Whole-word MLM
# ---------------------------------------------------------------------------

def _select_words_greedy(priorities, sizes, budget):
    """Greedy whole-word selection in random order with skip-and-continue
    (``collator.py:126-146``): iterate words by ascending priority; take a
    word iff its size fits in the remaining budget; oversized words are
    skipped but iteration continues."""
    order = jnp.argsort(priorities)
    sizes_sorted = sizes[order]

    def body(used, size):
        take = (size > 0) & (used + size <= budget)
        return used + size * take, take

    _, takes_sorted = jax.lax.scan(body, jnp.array(0, sizes.dtype), sizes_sorted)
    selected = jnp.zeros_like(takes_sorted).at[order].set(takes_sorted)
    return selected  # (W,) bool per word id


@functools.partial(jax.jit, static_argnames=("mlm_probability", "max_predictions",
                                             "vocab_size", "mask_token_id",
                                             "bos_token_id", "eos_token_id",
                                             "pad_token_id"))
def whole_word_mlm(
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    *,
    mlm_probability: float,
    max_predictions: int,
    vocab_size: int,
    mask_token_id: int,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
) -> Dict[str, jnp.ndarray]:
    """Returns {mlm_input_ids (B,L), mlm_positions (B,P), mlm_labels (B,P)}."""
    ids = batch["input_ids"]
    att = batch["attention_mask"]
    begin = batch["word_begin"]
    B, L = ids.shape
    P = max_predictions

    maskable = (att == 1) & (ids != bos_token_id) & (ids != eos_token_id) & (ids != pad_token_id)
    # a maskable token right after <s> always starts a word (the reference's
    # "subword with no preceding word opens a new word", collator.py:121-124)
    begin = begin.at[:, 1].set(jnp.where(maskable[:, 1], 1, begin[:, 1]))
    word_id = jnp.cumsum(begin * maskable.astype(begin.dtype), axis=1)  # (B, L), 0 = no word

    n_tokens = jnp.sum(att, axis=1)  # includes <s>
    budget = jnp.clip(jnp.round(n_tokens * mlm_probability).astype(jnp.int32), 1, P)

    rng_prio, rng_corrupt, rng_rand = jax.random.split(rng, 3)
    priorities = jax.random.uniform(rng_prio, (B, L + 1))

    def sizes_for_row(word_id_row, maskable_row):
        return jax.ops.segment_sum(
            maskable_row.astype(jnp.int32), word_id_row, num_segments=L + 1
        ).at[0].set(0)  # word 0 = tokens before any word: never masked

    sizes = jax.vmap(sizes_for_row)(word_id, maskable)  # (B, L+1)
    selected_words = jax.vmap(_select_words_greedy)(priorities, sizes, budget)  # (B, L+1)
    mask_label = jnp.take_along_axis(selected_words, word_id, axis=1).astype(bool) & maskable

    # 80% [MASK], 10% random token, 10% keep (collator.py:200-209)
    u = jax.random.uniform(rng_corrupt, (B, L))
    random_ids = jax.random.randint(rng_rand, (B, L), 0, vocab_size)
    mlm_input_ids = jnp.where(
        mask_label & (u < 0.8),
        mask_token_id,
        jnp.where(mask_label & (u >= 0.8) & (u < 0.9), random_ids, ids),
    )

    # gather masked positions into a static (B, P) block: earliest-first
    score = mask_label.astype(jnp.float32) * 2.0 - jnp.arange(L, dtype=jnp.float32) / L
    _, positions = jax.lax.top_k(score, P)  # (B, P)
    pos_is_masked = jnp.take_along_axis(mask_label, positions, axis=1)
    pos_labels = jnp.where(
        pos_is_masked, jnp.take_along_axis(ids, positions, axis=1), IGNORE_INDEX
    )
    return {
        "mlm_input_ids": mlm_input_ids,
        "mlm_positions": positions,
        "mlm_labels": pos_labels,
    }


# ---------------------------------------------------------------------------
# Composed batch builders
# ---------------------------------------------------------------------------

def make_pretrain_batch(rng: jax.Array, table, item_ids, seq_lens, config: RecformerConfig):
    """Full device-side pretrain batch: pair sampling -> two views -> MLM.

    View a = history prefix at ``max_token_num``; view b = the single target
    item at the short static ``item_seq_len`` (reference pads both to the same
    dynamic length — ``collator.py:32-42``)."""
    rng_pair, rng_mlm_a, rng_mlm_b = jax.random.split(rng, 3)
    prefix_len, target_pos = sample_pretrain_pairs(rng_pair, seq_lens)
    target_item = jnp.take_along_axis(item_ids, target_pos[:, None], axis=1)  # (B, 1)

    batch_a = assemble_for_config(table, item_ids, prefix_len, config)
    batch_b = assemble_for_config(
        table, target_item, jnp.ones_like(seq_lens), config, out_len=config.item_seq_len
    )
    batch_a.update(mlm_for_config(rng_mlm_a, batch_a, config))
    batch_b.update(mlm_for_config(rng_mlm_b, batch_b, config))
    return batch_a, batch_b


def make_finetune_batch(rng: jax.Array, table, item_ids, seq_lens, config: RecformerConfig):
    """Device-side finetune batch: sample a target over the whole sequence,
    build the prefix view, return (batch, labels)."""
    target_pos = sample_finetune_targets(rng, seq_lens)
    labels = jnp.take_along_axis(item_ids, target_pos[:, None], axis=1)[:, 0]
    batch = assemble_for_config(table, item_ids, target_pos, config)
    return batch, labels


def mlm_for_config(rng, batch, config: RecformerConfig, max_predictions: int | None = None):
    if max_predictions is None:
        L = batch["input_ids"].shape[1]
        # generous static bound: budget is round(0.15 * L), pad to multiple of 8
        max_predictions = min(512, ((int(round(L * config.mlm_probability)) + 15) // 8) * 8)
    return whole_word_mlm(
        rng,
        batch,
        mlm_probability=config.mlm_probability,
        max_predictions=max_predictions,
        vocab_size=config.vocab_size,
        mask_token_id=config.mask_token_id,
        bos_token_id=config.bos_token_id,
        eos_token_id=config.eos_token_id,
        pad_token_id=config.pad_token_id,
    )
