"""End-to-end learning signal: on structured synthetic data the two-stage
finetune must beat random ranking by a wide margin.

Synthetic world: items belong to C clusters with shared attribute words; every
user's sequence stays within one cluster. Predicting the held-out item is easy
(rank within the cluster) iff the model learns attribute->cluster structure
through the full pipeline (tokenize -> encode -> two-stage finetune ->
full-catalog ranking)."""

import jax
import jax.numpy as jnp
import numpy as np

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.datasets import EvalDataset, SequenceDataset
from recformer_tpu.data.item_table import ItemTable
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import SimpleVocab
from recformer_tpu.models.heads import RecformerForSeqRec
from recformer_tpu.training.loops import finetune_two_stage
from recformer_tpu.training.optimizer import create_optimizer
from recformer_tpu.training.steps import TrainState


def test_finetune_learns_cluster_structure():
    cfg = RecformerConfig.tiny(
        max_token_num=64, max_item_embeddings=6, item_seq_len=32,
        attention_window=(16, 16), finetune_negative_sample_size=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    rng = np.random.default_rng(0)

    n_clusters, per_cluster = 4, 8
    n_items = n_clusters * per_cluster
    cluster_words = [["alpha", "beta"], ["gamma", "delta"],
                     ["omega", "sigma"], ["kappa", "theta"]]
    tokenized = {}
    for i in range(n_items):
        c = i // per_cluster
        tokenized[i] = tok.encode_item({
            "kind": cluster_words[c][i % 2],
            "tag": cluster_words[c][(i + 1) % 2],
        })
    table_np = ItemTable.build(tokenized, cfg, tok.backend.pad_token_id)
    table = {k: jnp.asarray(v) for k, v in table_np.as_arrays().items()}

    n_users = 40
    train, val, test = {}, {}, {}
    for u in range(n_users):
        c = u % n_clusters
        pool = np.arange(c * per_cluster, (c + 1) * per_cluster)
        seq = list(rng.choice(pool, size=7, replace=True))
        train[u] = [int(x) for x in seq[:-2]]
        val[u] = [int(seq[-2])]
        test[u] = [int(seq[-1])]

    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=2e-3, warmup_steps=2, total_steps=400)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    train_ds = SequenceDataset(train, max_items=8)
    val_ds = EvalDataset(train, val, test, "val", max_items=8)
    test_ds = EvalDataset(train, val, test, "test", max_items=8)

    state, item_emb, metrics = finetune_two_stage(
        state, model, table, cfg, train_ds, val_ds, test_ds,
        num_epochs=4, batch_size=8, eval_batch_size=8, encode_batch_size=16,
        verbose=2, log=lambda *a: None,
    )
    # random ranking: Recall@10 ~= 10/32 = 0.31; cluster knowledge alone
    # bounds the label inside 8 items -> Recall@10 -> 1.0. Require clear
    # learning above chance with margin.
    assert metrics["Recall@10"] > 0.6, metrics
    assert metrics["AUC"] > 0.6, metrics


def test_pretraining_learns_contrastive_structure():
    """On clustered synthetic data, in-batch contrastive accuracy must rise
    well above the 1/B chance level after a few hundred steps."""
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.training.steps import make_pretrain_step

    cfg = RecformerConfig.tiny(
        max_token_num=64, max_item_embeddings=6, item_seq_len=32,
        attention_window=(16, 16), hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    rng = np.random.default_rng(1)
    n_clusters, per_cluster = 4, 4
    n_items = n_clusters * per_cluster
    words = [["aa", "bb"], ["cc", "dd"], ["ee", "ff"], ["gg", "hh"]]
    tokenized = {
        i: tok.encode_item({"kind": words[i // per_cluster][i % 2],
                            "tag": words[i // per_cluster][(i + 1) % 2]})
        for i in range(n_items)
    }
    table_np = ItemTable.build(tokenized, cfg, tok.backend.pad_token_id)
    table = {k: jnp.asarray(v) for k, v in table_np.as_arrays().items()}

    # users stay within one cluster -> the target item shares its cluster
    # with the history, so cluster info separates positives from (most)
    # in-batch negatives
    B = 8
    seqs = np.stack([
        rng.integers((u % n_clusters) * per_cluster,
                     (u % n_clusters + 1) * per_cluster, size=6)
        for u in range(B)
    ]).astype(np.int32)
    item_ids = jnp.asarray(seqs)
    seq_lens = jnp.full((B,), 6, jnp.int32)

    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=2e-3, warmup_steps=5, total_steps=300)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(cfg, model)

    accs = []
    for _ in range(60):
        state, m = step(state, jax.random.PRNGKey(2), table, item_ids, seq_lens)
        accs.append(float(m["accuracy"]))
    # batch has 2 users per cluster -> cluster knowledge alone gives ~50%;
    # chance is 1/8 = 12.5%. Require clear learning.
    assert np.mean(accs[-10:]) > 0.4, np.mean(accs[-10:])
