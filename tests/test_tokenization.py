"""Golden tests for item/sequence encoding semantics.

These lock in the reference tokenizer contract
(``/root/reference/recformer/tokenization.py:38-159``): attribute flattening
with key/value token types, newest-first item reversal, truncation rules, and
padding conventions.
"""

import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import SimpleVocab


@pytest.fixture
def tok():
    cfg = RecformerConfig.tiny()
    return RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))


def test_encode_item_types_and_truncation(tok):
    # words of <= 4 chars stay single tokens under SimpleVocab(chunk=4)
    item = {"make": "acme", "hue": "deep blue", "size": "big", "more": "drop"}
    ids, types, begins = tok.encode_item(item)
    # max_attr_num=3 drops the 4th attribute
    n_expected = (1 + 1) + (1 + 2) + (1 + 1)
    assert len(ids) == len(types) == len(begins) == n_expected
    assert types == [1, 2, 1, 2, 2, 1, 2]
    assert all(b == 1 for b in begins)  # all short words begin words


def test_subword_begin_flags(tok):
    # an 8-char word splits into two tokens; only the first begins the word
    ids, begins = tok.backend.tokenize_text("abcdefgh")
    assert len(ids) == 2
    assert begins == [True, False]


def test_attr_length_truncation():
    cfg = RecformerConfig.tiny(max_attr_length=3)
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    item = {"desc": "one two three four five"}
    ids, types, begins = tok.encode_item(item)
    assert len(ids) == 3  # key token + 2 value tokens
    assert types == [1, 2, 2]


def test_encode_reverses_and_truncates_items(tok):
    cfg = tok.config
    # 15 items but max_item_embeddings=11 -> keep 10 newest (reversed)
    items = [{"make": f"b{i}"} for i in range(15)]
    seq = tok.encode(items)
    per_item = 2  # key + value token
    assert seq.input_ids[0] == tok.backend.bos_token_id
    assert seq.item_position_ids[0] == 0
    assert seq.token_type_ids[0] == 0
    # 10 items kept
    assert len(seq.input_ids) == 1 + 10 * per_item
    # first encoded item is the LAST input item (newest first)
    newest_ids, _, _ = tok.encode_item({"make": "b14"})
    assert seq.input_ids[1 : 1 + per_item] == newest_ids
    # item position ids run 1..10, one per item
    assert seq.item_position_ids[1:3] == [1, 1]
    assert seq.item_position_ids[-2:] == [10, 10]
    # masks
    assert seq.attention_mask == [1] * len(seq.input_ids)
    assert seq.global_attention_mask[0] == 1
    assert sum(seq.global_attention_mask) == 1


def test_token_truncation_to_max_token_num():
    cfg = RecformerConfig.tiny(max_token_num=16, max_item_embeddings=11)
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    items = [{"brand": "some brand name here"} for _ in range(10)]
    seq = tok.encode(items)
    assert len(seq.input_ids) == 16
    assert len(seq.item_position_ids) == 16
    assert len(seq.token_type_ids) == 16


def test_padding_conventions(tok):
    cfg = tok.config
    batch = [tok.encode([{"brand": "x"}]), tok.encode([{"brand": "y"}, {"color": "z"}])]
    out = tok.padding(batch, pad_to_max=True)
    L = cfg.max_token_num
    assert out["input_ids"].shape == (2, L)
    n0 = len(batch[0].input_ids)
    assert out["input_ids"][0, n0] == tok.backend.pad_token_id
    assert out["item_position_ids"][0, n0] == cfg.max_item_embeddings - 1
    assert out["token_type_ids"][0, n0] == 3
    assert out["attention_mask"][0, n0] == 0
    assert out["global_attention_mask"][0, n0] == 0
    # content preserved
    np.testing.assert_array_equal(out["input_ids"][0, :n0], batch[0].input_ids)


def test_pre_encoded_items_path(tok):
    """encode(encode_item=False) accepts pre-tokenized (ids, types[, begins])."""
    raw = [{"brand": "alpha"}, {"color": "beta"}]
    pre = [tok.encode_item(it) for it in raw]
    a = tok.encode(raw, encode_item=True)
    b = tok.encode(pre, encode_item=False)
    assert a.input_ids == b.input_ids
    assert a.token_type_ids == b.token_type_ids
    assert a.item_position_ids == b.item_position_ids
    assert a.word_begin == b.word_begin


def test_deterministic_across_instances():
    cfg = RecformerConfig.tiny()
    t1 = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    t2 = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    item = {"brand": "stable hashing", "color": "royal purple"}
    assert t1.encode_item(item) == t2.encode_item(item)


def test_hf_text_backend_with_local_wordpiece(tmp_path):
    """HFTextBackend against a real (locally constructed) HF tokenizer:
    word-begin flags must match the reference subword predicate
    (collator.py:152-159)."""
    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "red", "guitar", "##s", "##ist", "wood", ",", "acoustic"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)

    from recformer_tpu.data.vocab import HFTextBackend

    backend = HFTextBackend(hf)
    ids, begins = backend.tokenize_text("guitarist , red")
    tokens = hf.convert_ids_to_tokens(ids)
    assert tokens == ["guitar", "##ist", ",", "red"]
    # The reference predicate (collator.py:152-159) is written for RoBERTa
    # byte-BPE ("space-prefixed string => word begin"); on a WordPiece
    # tokenizer it yields: "guitar"/"red" (no space prefix) -> continuation,
    # "##ist" ('#' is punctuation) -> begin, "," -> begin. The adapter must
    # reproduce that predicate faithfully, quirks included.
    assert begins == [False, True, True, False]

    # full item-encoding path over the HF backend
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.tokenization import RecformerTokenizer

    cfg = RecformerConfig.tiny(vocab_size=len(vocab),
                               pad_token_id=hf.pad_token_id,
                               bos_token_id=hf.cls_token_id,
                               eos_token_id=hf.sep_token_id,
                               mask_token_id=hf.mask_token_id)
    tok = RecformerTokenizer(cfg, backend)
    item_ids, types, wb = tok.encode_item({"kind": "guitars", "hue": "red wood"})
    toks = hf.convert_ids_to_tokens(item_ids)
    assert toks == ["kind", "guitar", "##s", "hue", "red", "wood"] or "[UNK]" in toks
    # key tokens type 1, value tokens type 2
    assert types[0] == 1 and 2 in types


def test_hf_text_backend_with_real_roberta_bpe(tmp_path):
    """HFTextBackend on the reference's actual tokenizer family — RoBERTa
    byte-level BPE (the reference subclasses LongformerTokenizer, i.e.
    RoBERTa BPE: /root/reference/recformer/tokenization.py:4-8) — built from
    a hand-written vocab.json/merges.txt so no network/asset download is
    needed. Golden semantics from the reference's inline smoke example
    (tokenization.py:163-218): attribute dicts like {'pt': ..., 'brand':
    'Galison++', 'mounting_type': 'Wall Mount++'}. Word-begin flags must
    follow the reference subword predicate (collator.py:152-159): begin iff
    the token's string form starts with a space (byte-level 'Ġ') or its
    first char is punctuation."""
    import json

    transformers = pytest.importorskip("transformers")

    base = list("GalisonWMutpbrd+")
    derived = ["Ga", "Gal", "is", "iso", "ison", "++",
               "Wa", "Wal", "Wall", "ĠM", "ou", "oun", "ount",
               "ĠMount", "pt", "br", "bra", "bran", "brand"]
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + base + ["Ġ"] + derived)}
    merges = ["#version: 0.2",
              "G a", "Ga l", "i s", "is o", "iso n", "+ +",
              "W a", "Wa l", "Wal l", "Ġ M", "o u", "ou n", "oun t",
              "ĠM ount", "p t", "b r", "br a", "bra n", "bran d"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
    hf = transformers.RobertaTokenizer(str(tmp_path / "vocab.json"),
                                       str(tmp_path / "merges.txt"))

    from recformer_tpu.data.vocab import HFTextBackend

    backend = HFTextBackend(hf)

    # byte-BPE subwords: "Galison++" -> Gal|ison|++ ; no leading space on the
    # first token, so per the reference predicate it is NOT a word begin
    # (quirk preserved); '++' begins because '+' is punctuation
    ids, begins = backend.tokenize_text("Galison++")
    assert hf.convert_ids_to_tokens(ids) == ["Gal", "ison", "++"]
    assert begins == [False, False, True]

    # space-separated words: second word gets the Ġ prefix -> word begin
    ids, begins = backend.tokenize_text("Wall Mount")
    assert hf.convert_ids_to_tokens(ids) == ["Wall", "ĠMount"]
    assert begins == [False, True]

    # full golden-shaped sequence encode through the BPE backend
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.tokenization import RecformerTokenizer

    cfg = RecformerConfig.tiny(vocab_size=len(vocab),
                               pad_token_id=hf.pad_token_id,
                               bos_token_id=hf.bos_token_id,
                               eos_token_id=hf.eos_token_id,
                               mask_token_id=hf.mask_token_id)
    tok = RecformerTokenizer(cfg, backend)
    items = [{"pt": "Galison++"}, {"brand": "Wall Mount"}]
    enc = tok.encode(items)
    toks = hf.convert_ids_to_tokens(enc.input_ids)
    # newest-first reversal: item 2 ('brand') precedes item 1 ('pt')
    assert toks == ["<s>", "brand", "Wall", "ĠMount", "pt", "Gal", "ison", "++"]
    assert enc.item_position_ids == [0, 1, 1, 1, 2, 2, 2, 2]
    # key tokens type 1, value tokens type 2, <s> type 0
    assert enc.token_type_ids == [0, 1, 2, 2, 1, 2, 2, 2]
    assert enc.global_attention_mask == [1, 0, 0, 0, 0, 0, 0, 0]
    assert enc.word_begin == [0, 0, 0, 1, 0, 0, 0, 1]
