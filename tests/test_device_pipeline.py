"""Device-side batch construction vs the host reference path, plus MLM
property tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.device_pipeline import (
    IGNORE_INDEX,
    assemble_for_config,
    make_finetune_batch,
    make_pretrain_batch,
    mlm_for_config,
    sample_finetune_targets,
    sample_pretrain_pairs,
)
from recformer_tpu.data.item_table import ItemTable
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import SimpleVocab


@pytest.fixture(scope="module")
def setup():
    cfg = RecformerConfig.tiny()
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "longerword", "tiny", "x", "multi word value"]
    n_items = 23
    tokenized = {}
    for i in range(n_items):
        attrs = {
            "make": words[rng.integers(len(words))],
            "hue": words[rng.integers(len(words))],
            "size": words[rng.integers(len(words))],
        }
        tokenized[i] = tok.encode_item(attrs)
    table_np = ItemTable.build(tokenized, cfg, tok.backend.pad_token_id)
    table = {k: jnp.asarray(v) for k, v in table_np.as_arrays().items()}
    return cfg, tok, tokenized, table


def host_reference_batch(tok, tokenized, seqs):
    """The reference host path: tokenizer.encode over pre-tokenized items."""
    enc = [tok.encode([tokenized[i] for i in s], encode_item=False) for s in seqs]
    return tok.padding(enc, pad_to_max=True)


def test_assembly_matches_host_reference(setup):
    cfg, tok, tokenized, table = setup
    rng = np.random.default_rng(1)
    # random sequences incl. very long (token truncation) and length-1 cases
    seqs = [list(rng.integers(0, len(tokenized), size=n)) for n in (1, 3, 10, 40, 17)]
    S_in = max(len(s) for s in seqs)
    B = len(seqs)
    item_ids = np.zeros((B, S_in), np.int32)
    seq_lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        item_ids[i, : len(s)] = s
        seq_lens[i] = len(s)

    dev = assemble_for_config(table, jnp.asarray(item_ids), jnp.asarray(seq_lens), cfg)
    ref = host_reference_batch(tok, tokenized, seqs)
    for key in ("input_ids", "item_position_ids", "token_type_ids",
                "attention_mask", "global_attention_mask", "word_begin"):
        np.testing.assert_array_equal(
            np.asarray(dev[key]), ref[key], err_msg=f"mismatch in {key}"
        )


def test_assembly_empty_prefix(setup):
    cfg, tok, tokenized, table = setup
    item_ids = jnp.asarray([[3, 4, 5]], dtype=jnp.int32)
    dev = assemble_for_config(table, item_ids, jnp.asarray([0], jnp.int32), cfg)
    # empty history -> just <s>
    assert int(dev["attention_mask"][0].sum()) == 1
    assert int(dev["input_ids"][0, 0]) == tok.backend.bos_token_id
    assert int(dev["global_attention_mask"][0, 0]) == 1


def test_pretrain_pair_sampling_bounds(setup):
    lens = jnp.asarray([1, 2, 5, 9, 20], jnp.int32)
    for seed in range(20):
        tp, _ = sample_pretrain_pairs(jax.random.PRNGKey(seed), lens)
        tp = np.asarray(tp)
        start = (np.asarray(lens) - 1) // 2
        assert np.all(tp >= start) and np.all(tp <= np.asarray(lens) - 1)


def test_finetune_target_sampling_bounds(setup):
    lens = jnp.asarray([1, 2, 5, 9, 20], jnp.int32)
    seen_zero = False
    for seed in range(50):
        tp = sample_finetune_targets(jax.random.PRNGKey(seed), lens)
        tp = np.asarray(tp)
        assert np.all(tp >= 0) and np.all(tp <= np.asarray(lens) - 1)
        seen_zero |= bool(np.any(tp[2:] == 0))
    assert seen_zero  # whole-sequence sampling reaches position 0


def test_mlm_properties(setup):
    cfg, tok, tokenized, table = setup
    rng = np.random.default_rng(2)
    B, S_in = 8, 10
    item_ids = jnp.asarray(rng.integers(0, len(tokenized), size=(B, S_in)), jnp.int32)
    seq_lens = jnp.full((B,), S_in, jnp.int32)
    batch = assemble_for_config(table, item_ids, seq_lens, cfg)
    out = mlm_for_config(jax.random.PRNGKey(3), batch, cfg)

    ids = np.asarray(batch["input_ids"])
    att = np.asarray(batch["attention_mask"])
    mlm_ids = np.asarray(out["mlm_input_ids"])
    positions = np.asarray(out["mlm_positions"])
    labels = np.asarray(out["mlm_labels"])

    changed = mlm_ids != ids
    # corruption only at attended, non-special positions
    assert np.all(att[changed.nonzero()[0], changed.nonzero()[1]] == 1)
    assert not np.any(changed[:, 0])  # <s> untouched

    # labels recover original ids at masked positions
    for b in range(B):
        for p in range(positions.shape[1]):
            if labels[b, p] != IGNORE_INDEX:
                assert labels[b, p] == ids[b, positions[b, p]]

    # masking budget: #masked <= round(0.15 * n_tokens) and >= 1
    n_valid = (labels != IGNORE_INDEX).sum(1)
    budget = np.round(att.sum(1) * cfg.mlm_probability)
    assert np.all(n_valid <= np.maximum(budget, 1))
    assert np.all(n_valid >= 1)


def test_mlm_masks_whole_words(setup):
    """If any token of a word is masked, all maskable tokens of it are."""
    cfg, tok, tokenized, table = setup
    rng = np.random.default_rng(3)
    B, S_in = 4, 8
    item_ids = jnp.asarray(rng.integers(0, len(tokenized), size=(B, S_in)), jnp.int32)
    seq_lens = jnp.full((B,), S_in, jnp.int32)
    batch = assemble_for_config(table, item_ids, seq_lens, cfg)
    out = mlm_for_config(jax.random.PRNGKey(11), batch, cfg)

    att = np.asarray(batch["attention_mask"])
    begin = np.asarray(batch["word_begin"])
    ids = np.asarray(batch["input_ids"])
    positions = np.asarray(out["mlm_positions"])
    labels = np.asarray(out["mlm_labels"])

    B_, L = ids.shape
    masked = np.zeros((B_, L), bool)
    for b in range(B_):
        for p, lab in zip(positions[b], labels[b]):
            if lab != IGNORE_INDEX:
                masked[b, p] = True

    maskable = (att == 1) & (ids != tok.backend.bos_token_id) & (ids != tok.backend.pad_token_id)
    for b in range(B_):
        # word id per token (mirror device logic incl. forced begin at pos 1)
        wb = begin[b].copy()
        if maskable[b, 1]:
            wb[1] = 1
        wid = np.cumsum(wb * maskable[b])
        for w in np.unique(wid[masked[b]]):
            members = (wid == w) & maskable[b]
            assert masked[b][members].all(), f"word {w} partially masked"


def test_composed_batches(setup):
    cfg, tok, tokenized, table = setup
    rng = np.random.default_rng(4)
    B, S_in = 6, 12
    item_ids = jnp.asarray(rng.integers(0, len(tokenized), size=(B, S_in)), jnp.int32)
    seq_lens = jnp.asarray(rng.integers(1, S_in + 1, size=(B,)), jnp.int32)

    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    assert ba["input_ids"].shape == (B, cfg.max_token_num)
    assert bb["input_ids"].shape == (B, cfg.item_seq_len)
    assert "mlm_input_ids" in ba and "mlm_positions" in bb
    # view b holds exactly one item: item positions in {0 (<s>), 1, pad}
    ipb = np.asarray(bb["item_position_ids"])
    attb = np.asarray(bb["attention_mask"])
    assert set(np.unique(ipb[attb == 1])) <= {0, 1}

    batch, labels = make_finetune_batch(jax.random.PRNGKey(1), table, item_ids, seq_lens, cfg)
    assert batch["input_ids"].shape == (B, cfg.max_token_num)
    assert labels.shape == (B,)
    assert np.all(np.asarray(labels) < len(tokenized))
