"""Native C++ batcher vs numpy fallback equivalence + integration."""

import numpy as np
import pytest

from recformer_tpu.native import (
    RaggedSequences,
    native_available,
    pack_item_table_native,
)


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_pack_matches_fallback():
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(0, 100, size=n)) for n in (1, 5, 12, 3, 30, 7)]
    r = RaggedSequences(seqs)
    order = np.arange(len(seqs), dtype=np.int64)
    ids, lens, valid = r.pack(order, 0, 8, max_len=10)
    assert ids.shape == (8, 10)
    for i, s in enumerate(seqs):
        kept = s[-10:]
        np.testing.assert_array_equal(ids[i, : len(kept)], kept)
        assert np.all(ids[i, len(kept):] == 0)
        assert lens[i] == len(kept)
        assert valid[i]
    # padding rows beyond n: invalid, len 1
    assert not valid[6] and not valid[7]
    assert lens[6] == 1


def test_shuffle_deterministic():
    seqs = [[i] for i in range(100)]
    r = RaggedSequences(seqs)
    o1 = r.epoch_order(True, 42)
    o2 = r.epoch_order(True, 42)
    o3 = r.epoch_order(True, 43)
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(o1, o3)
    assert sorted(o1.tolist()) == list(range(100))


def test_batches_iteration_drop_last():
    seqs = [[i, i + 1] for i in range(10)]
    r = RaggedSequences(seqs)
    batches = list(r.batches(4, max_len=4, drop_last=True))
    assert len(batches) == 2
    batches = list(r.batches(4, max_len=4, drop_last=False))
    assert len(batches) == 3
    # last batch padded with invalid rows
    _, _, valid = batches[-1]
    assert valid.sum() == 2


def test_pack_item_table_native_matches_python():
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.item_table import ItemTable

    cfg = RecformerConfig.tiny()
    rng = np.random.default_rng(1)
    tokenized = {}
    for i in range(9):
        n = int(rng.integers(1, cfg.max_item_token_len + 5))
        tokenized[i] = (
            list(rng.integers(4, 100, size=n)),
            list(rng.integers(1, 3, size=n)),
            list(rng.integers(0, 2, size=n)),
        )
    table = ItemTable.build(tokenized, cfg, pad_token_id=1)

    # python reference
    m = cfg.max_item_token_len
    for i, (ids, types, begins) in tokenized.items():
        L = min(len(ids), m)
        np.testing.assert_array_equal(table.token_ids[i, :L], ids[:L])
        np.testing.assert_array_equal(table.token_types[i, :L], types[:L])
        np.testing.assert_array_equal(table.word_begin[i, :L], begins[:L])
        assert table.lengths[i] == L
        assert np.all(table.token_ids[i, L:] == 1)
        assert np.all(table.token_types[i, L:] == 3)
    # null item row
    assert table.lengths[-1] == 0


def test_sequence_dataset_uses_ragged():
    from recformer_tpu.data.datasets import SequenceDataset

    user2seq = {u: list(range(u + 1)) for u in range(9)}
    ds = SequenceDataset(user2seq, max_items=5)
    seen = 0
    for batch in ds.batches(4, shuffle=True, seed=1):
        assert batch.item_ids.shape == (4, 5)
        seen += int(batch.valid.sum())
    assert seen == 9


def test_multi_host_sharded_batches():
    from recformer_tpu.data.datasets import SequenceDataset

    user2seq = {u: [u, u + 1, u + 2] for u in range(20)}
    ds = SequenceDataset(user2seq, max_items=4)
    seen = []
    for pi in range(4):
        for batch in ds.batches(4, shuffle=True, seed=3, process_index=pi,
                                process_count=4):
            seen.extend(batch.item_ids[batch.valid, 0].tolist())
    # every user's first item seen exactly once across all processes
    assert sorted(seen) == sorted(s[0] for s in ds.seqs)


def test_native_corpus_tokenizer_matches_python():
    """C++ hash tokenizer (native/tokenizer.cpp) == the Python
    SimpleVocab/encode_item path bit-for-bit, including per-attribute
    name+value truncation, max_attr_num drop, multi-chunk words, and items
    missing from the meta."""
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.item_table import ItemTable
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab
    from recformer_tpu.native import native_available

    if not native_available():
        import pytest

        pytest.skip("no native toolchain")

    cfg = RecformerConfig.tiny(max_attr_num=2, max_attr_length=6)
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    meta = {
        "A": {"title": "a verylongwordindeed bc", "brand": "orchid x",
              "extra_dropped": "zz"},
        "B": {"title": "solo"},
        "C": {"t": "", "u": "tab\tsep  multi   space"},
        # "D" intentionally absent: dense id 3 has no meta
    }
    smap = {"A": 0, "B": 1, "C": 2, "D": 3}

    fast = tok.encode_corpus_table(meta, smap)
    slow = ItemTable.build(tok.tokenize_corpus(meta, smap), cfg,
                           tok.backend.pad_token_id)
    for name in ("token_ids", "token_types", "word_begin", "lengths"):
        np.testing.assert_array_equal(getattr(fast, name), getattr(slow, name),
                                      err_msg=name)


def test_native_corpus_tokenizer_nonascii_falls_back():
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.item_table import ItemTable
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab

    cfg = RecformerConfig.tiny()
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    meta = {"A": {"title": "café naïve"}}
    smap = {"A": 0}
    fast = tok.encode_corpus_table(meta, smap)  # must take the Python path
    slow = ItemTable.build(tok.tokenize_corpus(meta, smap), cfg,
                           tok.backend.pad_token_id)
    np.testing.assert_array_equal(fast.token_ids, slow.token_ids)
