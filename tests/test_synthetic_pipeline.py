"""Structured synthetic benchmark generator (pipelines/synthetic.py) — the
no-egress fallback corpus for the north-star protocol."""

import os

import numpy as np

from recformer_tpu.pipelines.synthetic import (generate_benchmark,
                                               popularity_baseline)
from recformer_tpu.utils.io import read_json


def test_generate_benchmark_structure(tmp_path):
    stats = generate_benchmark(
        str(tmp_path), n_items=60, n_users=80, n_categories=6, n_brands=12,
        pretrain_items=70, pretrain_users=50, seed=3)
    ft = tmp_path / "finetune"
    pre = tmp_path / "pretrain"

    train = read_json(str(ft / "train.json"))
    val = read_json(str(ft / "val.json"))
    test = read_json(str(ft / "test.json"))
    meta = read_json(str(ft / "meta_data.json"))
    smap = read_json(str(ft / "smap.json"))

    # leave-one-out: same users in all three splits, single-label val/test
    assert set(train) == set(val) == set(test)
    assert all(len(v) == 1 for v in val.values())
    assert all(len(t) == 1 for t in test.values())
    assert all(len(s) >= 3 for s in train.values())
    # dense item ids covered by meta + smap
    assert set(smap.values()) == set(range(60))
    assert set(meta) == set(smap)
    for attrs in meta.values():
        assert set(attrs) == {"title", "brand", "category"}
        assert len(attrs["title"].split()) >= 4

    # pretrain universe is DISJOINT (paper zero-shot-transfer setting)
    smap_p = read_json(str(pre / "smap.json"))
    assert not (set(smap) & set(smap_p))
    seqs = read_json(str(pre / "train.json"))
    assert seqs and all(isinstance(s, list) for s in seqs)
    assert max(max(s) for s in seqs) < 70

    # deterministic per seed
    stats2 = generate_benchmark(
        str(tmp_path / "again"), n_items=60, n_users=80, n_categories=6,
        n_brands=12, pretrain_items=70, pretrain_users=50, seed=3)
    t2 = read_json(str(tmp_path / "again" / "finetune" / "train.json"))
    assert t2 == train


def _cat_word_overlap(meta_a, meta_b):
    """Mean Jaccard overlap of per-category title-word sets across two
    universes (categories matched by their attribute name)."""
    def words_by_cat(meta):
        out = {}
        for attrs in meta.values():
            out.setdefault(attrs["category"], set()).update(
                attrs["title"].split())
        return out

    wa, wb = words_by_cat(meta_a), words_by_cat(meta_b)
    common = set(wa) & set(wb)
    assert common
    scores = [len(wa[c] & wb[c]) / max(1, len(wa[c] | wb[c])) for c in common]
    return float(np.mean(scores))


def _empirical_cat_trans(seqs, meta, smap, n_categories):
    """Row-normalized category->category transition counts from histories."""
    id2cat_name = {}
    for asin, attrs in meta.items():
        id2cat_name[smap[asin]] = attrs["category"]
    cats = sorted(set(id2cat_name.values()))
    cat_idx = {c: i for i, c in enumerate(cats)}
    T = np.zeros((n_categories, n_categories))
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            T[cat_idx[id2cat_name[a]], cat_idx[id2cat_name[b]]] += 1
    T /= np.maximum(T.sum(axis=1, keepdims=True), 1)
    return T, cat_idx


def test_shared_kernel_variant_transfers_structure(tmp_path):
    """The mechanism-experiment corpus must contain the transferable signal
    the default corpus lacks: same category vocabularies and the same
    category co-occurrence dynamics in both universes (items disjoint)."""
    kw = dict(n_items=300, n_users=400, n_categories=8, n_brands=20,
              pretrain_items=350, pretrain_users=400, seed=11)
    generate_benchmark(str(tmp_path / "shared"), shared_kernel=True, **kw)
    generate_benchmark(str(tmp_path / "plain"), shared_kernel=False, **kw)

    def load(root):
        ft, pre = root / "finetune", root / "pretrain"
        return (read_json(str(ft / "meta_data.json")),
                read_json(str(ft / "smap.json")),
                read_json(str(ft / "train.json")),
                read_json(str(pre / "meta_data.json")),
                read_json(str(pre / "smap.json")),
                read_json(str(pre / "train.json")))

    meta_f, smap_f, train_f, meta_p, smap_p, train_p = load(tmp_path / "shared")
    # items stay disjoint
    assert not (set(smap_f) & set(smap_p))

    # 1) same language: category word pools overlap strongly across
    #    universes in the shared variant, weakly in the default
    ov_shared = _cat_word_overlap(meta_f, meta_p)
    m2f, _, _, m2p, _, _ = load(tmp_path / "plain")
    ov_plain = _cat_word_overlap(m2f, m2p)
    # every title also mixes in one word from the (universe-specific when
    # plain) 200-word common pool, diluting the Jaccard — separation vs the
    # plain variant is the real check
    assert ov_shared > 0.35, ov_shared
    assert ov_plain < 0.2, ov_plain
    assert ov_shared > 2 * ov_plain, (ov_shared, ov_plain)

    # 2) same dynamics: empirical category-transition matrices of the two
    #    universes' histories correlate strongly under the shared kernel
    Tf, idx_f = _empirical_cat_trans(
        list(train_f.values()), meta_f, smap_f, 8)
    Tp, idx_p = _empirical_cat_trans(train_p, meta_p, smap_p, 8)
    # align rows/cols by category name
    names = sorted(set(idx_f) & set(idx_p))
    af = np.ix_([idx_f[n] for n in names], [idx_f[n] for n in names])
    ap_ = np.ix_([idx_p[n] for n in names], [idx_p[n] for n in names])
    corr = np.corrcoef(Tf[af].ravel(), Tp[ap_].ravel())[0, 1]
    assert corr > 0.8, corr

    # determinism per seed
    generate_benchmark(str(tmp_path / "shared2"), shared_kernel=True, **kw)
    assert read_json(str(tmp_path / "shared2" / "finetune" / "train.json")) \
        == train_f


def test_popularity_baseline_bounds(tmp_path):
    generate_benchmark(str(tmp_path), n_items=60, n_users=200,
                       n_categories=6, n_brands=12, pretrain_items=70,
                       pretrain_users=50, seed=4)
    ft = tmp_path / "finetune"
    m = popularity_baseline(read_json(str(ft / "train.json")),
                            read_json(str(ft / "test.json")), 60)
    # structured (non-uniform) data: popularity beats random but is far
    # from perfect — the window a learned model must land above
    random_ndcg = 10 / 60 * 0.5  # loose upper bound on random NDCG@10
    assert 0.0 < m["NDCG@10"] < 0.6
    assert m["Recall@10"] > 10 / 60  # better than random
