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
