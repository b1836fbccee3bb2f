"""Offline data-pipeline tests: amazon + transactional artifact contracts,
clustering analytics."""

import gzip
import json
import os

import numpy as np
import pytest

from recformer_tpu.pipelines.amazon import build_finetune_category, build_pretrain_corpus
from recformer_tpu.pipelines.transactional import (
    amount_bin_label,
    build_all,
    fit_signature_encoder,
    make_amount_bins,
)
from recformer_tpu.utils.clustering import (
    kmeans,
    kmeans_sweep,
    pca_project,
    pick_optimal_k,
    silhouette_score,
)


def write_jsonl_gz(path, rows):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture
def amazon_raw(tmp_path):
    rng = np.random.default_rng(0)
    asins = [f"A{i:03d}" for i in range(30)]
    meta = [{"asin": a, "title": f"item {a}", "brand": f"brand{i%5}",
             "category": ["Cat", f"sub{i%3}"]} for i, a in enumerate(asins)]
    reviews = []
    for u in range(40):
        n = rng.integers(4, 10)
        for t in range(n):
            reviews.append({
                "reviewerID": f"U{u:03d}",
                "asin": asins[rng.integers(len(asins))],
                "unixReviewTime": int(1e9 + u * 1000 + t),
            })
    write_jsonl_gz(tmp_path / "Cat_metadata.jsonl.gz", meta)
    write_jsonl_gz(tmp_path / "Cat_reviews.jsonl.gz", reviews)
    write_jsonl_gz(tmp_path / "Dev_metadata.jsonl.gz", meta)
    write_jsonl_gz(tmp_path / "Dev_reviews.jsonl.gz", reviews[:100])
    return tmp_path


def test_amazon_finetune_artifacts(amazon_raw, tmp_path):
    out = tmp_path / "ft"
    build_finetune_category(
        str(amazon_raw / "Cat_reviews.jsonl.gz"),
        str(amazon_raw / "Cat_metadata.jsonl.gz"),
        str(out),
        subsample_one_in=1,  # keep all users for the test
    )
    train = json.load(open(out / "train.json"))
    val = json.load(open(out / "val.json"))
    test = json.load(open(out / "test.json"))
    smap = json.load(open(out / "smap.json"))
    meta = json.load(open(out / "meta_data.json"))
    assert len(train) > 0
    # leave-one-out: val/test hold exactly one item; train = rest
    for u in val:
        assert len(val[u]) == 1 and len(test[u]) == 1
        assert u in train
    # smap ids dense
    assert sorted(smap.values()) == list(range(len(smap)))
    # meta only for mapped items
    assert set(meta) <= set(smap)


def test_amazon_pretrain_corpus(amazon_raw, tmp_path):
    out = tmp_path / "pre"
    build_pretrain_corpus(["Cat", "Dev"], str(amazon_raw), str(out))
    train = json.load(open(out / "train.json"))
    dev = json.load(open(out / "dev.json"))
    smap = json.load(open(out / "smap.json"))
    assert len(train) > 0 and len(dev) > 0
    flat = [i for s in train + dev for i in s]
    assert max(flat) < len(smap)


def test_amount_binning():
    edges, labels = make_amount_bins()
    assert amount_bin_label(0.0, edges, labels) == labels[0]
    assert amount_bin_label(-5.0, edges, labels) == amount_bin_label(5.0, edges, labels)
    assert amount_bin_label(10_500.0, edges, labels) == labels[-1]
    assert labels[-1].endswith("-inf")
    # [left, right): exactly 10 falls in the bin starting at 10
    lab = amount_bin_label(10.0, edges, labels)
    assert lab.startswith("10-")


def test_signature_encoder_sorted():
    rows = [{"transaction_signature": s} for s in ("b", "a", "c", "a")]
    enc = fit_signature_encoder(rows)
    assert enc == {"a": "TRANSACTION_0", "b": "TRANSACTION_1", "c": "TRANSACTION_2"}


@pytest.fixture
def txn_csv(tmp_path):
    import csv

    rng = np.random.default_rng(0)
    path = tmp_path / "txn_train.csv"
    merchants = ["shopA", "shopB", "shopC"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "trans_date_trans_time", "amt", "merchant", "cc_num", "is_fraud"])
        w.writeheader()
        for card in range(12):
            n = int(rng.integers(3, 9))
            for t in range(n):
                w.writerow({
                    "trans_date_trans_time": f"2020-0{1 + t % 9}-1{t % 9} 12:3{t % 6}:00",
                    "amt": float(rng.uniform(1, 500)),
                    "merchant": merchants[int(rng.integers(3))],
                    "cc_num": f"4000{card:04d}",
                    "is_fraud": int(rng.random() < 0.2),
                })
    return path


def test_transactional_build_all(txn_csv, tmp_path):
    out = tmp_path / "txn_out"
    build_all([str(txn_csv)], [], str(out), seed=0)
    for sub in ("pretrain_data", "finetune_data", "classification_data",
                "classification_data_single"):
        assert (out / sub).exists(), sub
    smap = json.load(open(out / "smap.json"))
    meta = json.load(open(out / "meta_data.json"))
    assert set(meta) == set(smap)
    assert all(t.startswith("TRANSACTION_") for t in smap)
    # meta attribute contract
    sample = next(iter(meta.values()))
    assert set(sample) == {"amount", "merchant", "year", "month", "day", "weekday"}
    # classification rows: [sequence, [flag]]
    cls = json.load(open(out / "classification_data" / "train.json"))
    for seq, flag in cls.values():
        assert isinstance(seq, list) and flag[0] in (0, 1)
    # classification_single labels are per-transaction
    single = json.load(open(out / "classification_data_single" / "train.json"))
    assert len(single) > 0
    pre_train = json.load(open(out / "pretrain_data" / "train.json"))
    pre_dev = json.load(open(out / "pretrain_data" / "dev.json"))
    assert len(pre_train) > len(pre_dev) > 0


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal(0, 0.1, (50, 8)),
        rng.normal(3, 0.1, (50, 8)),
        rng.normal(-3, 0.1, (50, 8)),
    ])
    labels, centers, inertia = kmeans(blobs, 3)
    # each true blob maps to exactly one cluster
    for lo, hi in ((0, 50), (50, 100), (100, 150)):
        assert len(np.unique(labels[lo:hi])) == 1
    assert silhouette_score(blobs, labels) > 0.8
    sweep = kmeans_sweep(blobs, 2, 6)
    assert pick_optimal_k(sweep) == 3


def test_pca_project():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 16))
    p = pca_project(x, 2)
    assert p.shape == (100, 2)
    # components are orthogonal in projection space
    c = np.corrcoef(p[:, 0], p[:, 1])[0, 1]
    assert abs(c) < 0.2


def test_tsne_project_separates_blobs():
    from recformer_tpu.utils.clustering import tsne_project

    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (40, 8))
    b = rng.normal(4, 0.05, (40, 8))
    x = np.concatenate([a, b])
    p = tsne_project(x, 2, perplexity=10.0)
    assert p.shape == (80, 2)
    # the two blobs stay separated in the embedding: the closest cross-blob
    # pair is farther than the median within-blob distance
    pa, pb = p[:40], p[40:]
    cross = np.min(np.linalg.norm(pa[:, None] - pb[None], axis=-1))
    within = np.median(np.linalg.norm(pa[:, None] - pa[None], axis=-1))
    assert cross > within


def test_cluster_description_prompt():
    from recformer_tpu.utils.clustering import cluster_description_prompt

    p = cluster_description_prompt(2, ["Item A", "Item B"], {"size": 10, "fraction": 0.5})
    assert "Cluster 2" in p and "Item A" in p and "10 users" in p


def test_synthetic_transaction_stream(tmp_path):
    """Generator emits the raw-CSV schema parse_row consumes, with a planted
    per-card fraud signal at the configured rate, deterministically."""
    from recformer_tpu.pipelines.synthetic_transactions import generate_stream

    out = tmp_path / "txn"
    stats = generate_stream(str(out), n_cards=60, test_cards=20,
                            n_merchants=12, seed=3)
    assert stats["cards"] == 80 and stats["transactions"] > 300
    # planted rate ~8%: allow wide tolerance at this scale
    assert 0 < stats["fraud_cards"] < 0.25 * stats["cards"]

    edges, labels = make_amount_bins()
    import csv

    from recformer_tpu.pipelines.transactional import parse_row

    with open(out / "txn_train_raw.csv", newline="") as f:
        rows = [parse_row(r, edges, labels) for r in csv.DictReader(f)]
    assert all(r is not None for r in rows)
    fraud_amts = [float(r["amt_bin"].split("-")[0]) for r in rows
                  if r["is_fraud"] == "1"]
    clean_amts = [float(r["amt_bin"].split("-")[0]) for r in rows
                  if r["is_fraud"] == "0"]
    # the planted signal: fraud bursts live in the high amount bins, fully
    # outside the legit range
    assert fraud_amts and min(fraud_amts) >= 1200 > max(clean_amts)

    # determinism: same seed -> identical bytes
    out2 = tmp_path / "txn2"
    generate_stream(str(out2), n_cards=60, test_cards=20, n_merchants=12,
                    seed=3)
    assert (out / "txn_train_raw.csv").read_bytes() == \
        (out2 / "txn_train_raw.csv").read_bytes()

    # end-to-end: build_all consumes the CSVs
    build_all([str(out / "txn_train_raw.csv")],
              [str(out / "txn_test_raw.csv")], str(tmp_path / "art"),
              number_items=None)
    cls = json.load(open(tmp_path / "art" / "classification_data" / "train.json"))
    flags = [v[1][0] for v in cls.values()]
    assert set(flags) <= {0, 1} and sum(flags) > 0


def test_umap_project_separates_blobs_and_is_deterministic():
    from recformer_tpu.utils.clustering import umap_project

    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (40, 8))
    b = rng.normal(4, 0.05, (40, 8))
    x = np.concatenate([a, b])
    p = umap_project(x, 2, n_neighbors=10)
    assert p.shape == (80, 2)
    pa, pb = p[:40], p[40:]
    cross = np.min(np.linalg.norm(pa[:, None] - pb[None], axis=-1))
    within = np.median(np.linalg.norm(pa[:, None] - pa[None], axis=-1))
    assert cross > within
    # fully seeded -> bitwise deterministic
    np.testing.assert_array_equal(p, umap_project(x, 2, n_neighbors=10))
    # degenerate tiny input falls back to PCA
    assert umap_project(x[:3], 2).shape == (3, 2)
