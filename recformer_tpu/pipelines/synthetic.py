"""Structured synthetic Amazon-like benchmark — the no-egress fallback for
the north-star measurement protocol (VERDICT round-1 item 1; the recorded
download failure is ``docs/artifacts/download_attempt_round2.txt``).

The reference's purpose is text-transfer sequential recommendation: pretrain
on seven Amazon categories, finetune on six *disjoint* ones, rank the full
catalog leave-one-out (``/root/reference/README.md:111-135``,
``finetune_data/process.py:97-108``). Real dumps are unreachable from this
box, so this module generates a corpus with the same *shape* and — unlike
iid-random synthetic data — learnable structure on both axes the model uses:

- **text -> latent**: each item has one latent category and one brand; its
  title/brand/category attributes are drawn from category-conditional
  vocabularies, so item text predicts the latent factor. Pretrain and
  finetune item universes are DISJOINT (different item ids, same language),
  matching the paper's zero-shot-transfer setting.
- **sequence -> latent**: user histories are Markov walks over the user's
  1-3 preferred categories; item choice within a category is popularity-Zipf
  with an item->co-item successor kernel, so the last-item target is
  predictable from the history well above popularity.

Default scale mirrors the smallest paper category
(Industrial_and_Scientific: ~5.3k items / ~11k users); ``--scale small``
generates a CI-sized corpus. Emits the exact artifact layout the drivers
consume: finetune ``train/val/test/meta_data/smap.json`` (leave-one-out) and
pretrain ``train/dev/meta_data/smap.json`` (sequence lists).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.io import write_json

_SYLLA = ["ta", "ri", "mo", "ke", "lu", "san", "der", "pex", "vol", "qui",
          "bra", "sto", "nel", "fim", "gar", "hyd", "zor", "pla", "cre", "wix"]


def _word(rng_or_idx: int) -> str:
    """Deterministic pronounceable pseudo-word for vocab index i."""
    i = int(rng_or_idx)
    parts = []
    for _ in range(2 + i % 2):
        parts.append(_SYLLA[i % len(_SYLLA)])
        i //= len(_SYLLA)
    return "".join(parts) + str(rng_or_idx % 7)


def _zipf_probs(n: int, a: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def make_catalog(rng, n_items: int, n_categories: int, n_brands: int,
                 vocab_words: int = 2000, words_per_cat: int = 30,
                 id_prefix: str = "I"):
    """Items with category-conditional attribute text.

    Returns (meta: {asin: attrs}, smap: {asin: dense id}, item_cat (n,),
    item_pop (n,) within-category popularity weight, co_items (n, 5))."""
    cat_word_pool = rng.permutation(vocab_words)
    cat_words = cat_word_pool[: n_categories * words_per_cat].reshape(
        n_categories, words_per_cat)
    common_words = cat_word_pool[n_categories * words_per_cat:
                                 n_categories * words_per_cat + 200]
    cat_of_brand = rng.integers(0, n_categories, size=n_brands)

    cat_probs = _zipf_probs(n_categories, 1.05)
    item_cat = rng.choice(n_categories, size=n_items, p=cat_probs)
    item_brand = np.empty(n_items, np.int64)
    for i in range(n_items):
        k = item_cat[i]
        own = np.flatnonzero(cat_of_brand == k)
        # brands mostly live inside one category; fall back to any brand
        if len(own) and rng.random() < 0.9:
            item_brand[i] = rng.choice(own)
        else:
            item_brand[i] = rng.integers(0, n_brands)

    meta, smap = {}, {}
    for i in range(n_items):
        k = item_cat[i]
        n_title = rng.integers(4, 9)
        own = rng.choice(cat_words[k], size=n_title - 1)
        mix = rng.choice(common_words, size=1)
        title = " ".join(_word(w) for w in np.concatenate([own, mix]))
        asin = f"{id_prefix}{i:06d}"
        meta[asin] = {
            "title": title,
            "brand": f"brand_{_word(1000 + int(item_brand[i]))}",
            "category": f"cat_{_word(3000 + int(k))}",
        }
        smap[asin] = i

    # within-category popularity: Zipf by per-category rank
    item_pop = np.empty(n_items)
    for k in range(n_categories):
        idx = np.flatnonzero(item_cat == k)
        if len(idx):
            item_pop[idx] = _zipf_probs(len(idx))[rng.permutation(len(idx))]
    # successor kernel: 5 co-items per item, same category preferred
    co_items = np.empty((n_items, 5), np.int64)
    for k in range(n_categories):
        idx = np.flatnonzero(item_cat == k)
        for i in idx:
            pool = idx if len(idx) >= 6 else np.arange(n_items)
            co_items[i] = rng.choice(pool, size=5)
    return meta, smap, item_cat, item_pop, co_items


def make_histories(rng, n_users: int, item_cat, item_pop, co_items,
                   min_len: int = 5, max_len: int = 40,
                   p_stay: float = 0.75, p_co: float = 0.35):
    """Markov user walks: preferred categories + co-item successor kernel."""
    n_items = len(item_cat)
    n_categories = int(item_cat.max()) + 1
    by_cat = [np.flatnonzero(item_cat == k) for k in range(n_categories)]
    cat_item_probs = []
    for k in range(n_categories):
        w = item_pop[by_cat[k]]
        cat_item_probs.append(w / w.sum() if len(w) else None)
    cat_probs = np.array([len(b) for b in by_cat], float)
    cat_probs /= cat_probs.sum()

    users = []
    lens = np.clip(np.round(rng.lognormal(np.log(9), 0.5, size=n_users)),
                   min_len, max_len).astype(int)
    for u in range(n_users):
        n_pref = rng.integers(1, 4)
        prefs = rng.choice(n_categories, size=n_pref, replace=False,
                           p=cat_probs)
        prefs = [k for k in prefs if len(by_cat[k])] or \
            [int(np.argmax(cat_probs))]
        cur_cat = int(rng.choice(prefs))
        seq = []
        prev = None
        for _ in range(lens[u]):
            if prev is not None and rng.random() < p_co:
                nxt = int(rng.choice(co_items[prev]))
            else:
                if rng.random() >= p_stay:
                    cur_cat = int(rng.choice(prefs))
                pool = by_cat[cur_cat]
                nxt = int(rng.choice(pool, p=cat_item_probs[cur_cat]))
            seq.append(nxt)
            prev = nxt
            cur_cat = int(item_cat[nxt])
        users.append(seq)
    return users


def generate_benchmark(out_dir: str, n_items: int = 5300,
                       n_users: int = 11000, n_categories: int = 60,
                       n_brands: int = 300, pretrain_items: int = 8000,
                       pretrain_users: int = 16000, seed: int = 7):
    """Write the full two-corpus benchmark under ``out_dir``:

    - ``finetune/``: leave-one-out artifacts on item universe F
    - ``pretrain/``: sequence-list artifacts on DISJOINT item universe P
      (same vocabulary/language — the transfer the paper measures)
    """
    rng = np.random.default_rng(seed)
    ft = os.path.join(out_dir, "finetune")
    pre = os.path.join(out_dir, "pretrain")

    meta_f, smap_f, cat_f, pop_f, co_f = make_catalog(
        rng, n_items, n_categories, n_brands, id_prefix="F")
    users = make_histories(rng, n_users, cat_f, pop_f, co_f)
    train, val, test = {}, {}, {}
    kept = 0
    for seq in users:
        if len(seq) < 5:
            continue
        u = str(kept)
        train[u], val[u], test[u] = seq[:-2], [seq[-2]], [seq[-1]]
        kept += 1
    for name, obj in (("train.json", train), ("val.json", val),
                      ("test.json", test), ("meta_data.json", meta_f),
                      ("smap.json", smap_f)):
        write_json(obj, os.path.join(ft, name))

    rng_p = np.random.default_rng(seed + 1)
    meta_p, smap_p, cat_p, pop_p, co_p = make_catalog(
        rng_p, pretrain_items, n_categories, n_brands, id_prefix="P")
    pusers = make_histories(rng_p, pretrain_users, cat_p, pop_p, co_p)
    n_dev = min(max(64, pretrain_users // 20), pretrain_users // 2)
    write_json(pusers[n_dev:], os.path.join(pre, "train.json"))
    write_json(pusers[:n_dev], os.path.join(pre, "dev.json"))
    write_json(meta_p, os.path.join(pre, "meta_data.json"))
    write_json(smap_p, os.path.join(pre, "smap.json"))
    return {"finetune_users": kept, "finetune_items": n_items,
            "pretrain_users": pretrain_users, "pretrain_items": pretrain_items}


def popularity_baseline(train: dict, test: dict, n_items: int, k: int = 10):
    """NDCG@k / Recall@k of the global-popularity ranker — the floor any
    learned model must clear."""
    counts = np.zeros(n_items)
    for seq in train.values():
        for i in seq:
            counts[i] += 1
    order = np.argsort(-counts)
    rank_of = np.empty(n_items, np.int64)
    rank_of[order] = np.arange(n_items)
    ndcg = recall = 0.0
    n = 0
    for u, targets in test.items():
        t = targets[0]
        r = rank_of[t]
        n += 1
        if r < k:
            recall += 1.0
            ndcg += 1.0 / np.log2(r + 2)
    return {"NDCG@10": ndcg / max(n, 1), "Recall@10": recall / max(n, 1)}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", choices=["paper", "small", "tiny"],
                    default="paper")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)
    scales = {
        "paper": dict(),
        "small": dict(n_items=800, n_users=2000, n_categories=20,
                      n_brands=60, pretrain_items=1200, pretrain_users=3000),
        "tiny": dict(n_items=120, n_users=200, n_categories=8, n_brands=16,
                     pretrain_items=150, pretrain_users=300),
    }
    stats = generate_benchmark(args.out, seed=args.seed, **scales[args.scale])
    from ..utils.io import read_json

    ft = os.path.join(args.out, "finetune")
    base = popularity_baseline(read_json(os.path.join(ft, "train.json")),
                               read_json(os.path.join(ft, "test.json")),
                               stats["finetune_items"])
    stats["popularity_baseline"] = base
    write_json(stats, os.path.join(args.out, "stats.json"))
    print(stats)


if __name__ == "__main__":
    main()
