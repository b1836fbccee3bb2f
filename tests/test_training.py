"""End-to-end training smoke tests on synthetic data (tiny config, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.datasets import EvalDataset, FraudDataset, SequenceDataset
from recformer_tpu.data.item_table import ItemTable
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import SimpleVocab
from recformer_tpu.models.heads import (
    RecformerForFraudDetection,
    RecformerForPretraining,
    RecformerForSeqRec,
)
from recformer_tpu.training.loops import (
    encode_all_items,
    evaluate_fraud,
    evaluate_seqrec,
    finetune_two_stage,
    roc_auc,
)
from recformer_tpu.training.optimizer import create_optimizer
from recformer_tpu.training.steps import (
    TrainState,
    make_fraud_train_step,
    make_pretrain_step,
)


def tiny_cfg(**kw):
    defaults = dict(
        max_token_num=64,
        max_item_embeddings=6,
        item_seq_len=32,
        attention_window=(16, 16),
        finetune_negative_sample_size=5,
    )
    defaults.update(kw)
    return RecformerConfig.tiny(**defaults)


@pytest.fixture(scope="module")
def world():
    cfg = tiny_cfg()
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    rng = np.random.default_rng(0)
    n_items = 20
    words = ["red", "blue", "big", "tiny", "wood", "iron", "soft", "loud"]
    tokenized = {
        i: tok.encode_item({
            "make": words[i % len(words)],
            "hue": words[(i * 3 + 1) % len(words)],
        })
        for i in range(n_items)
    }
    table_np = ItemTable.build(tokenized, cfg, tok.backend.pad_token_id)
    table = {k: jnp.asarray(v) for k, v in table_np.as_arrays().items()}

    n_users = 24
    user2train = {u: list(rng.integers(0, n_items, size=rng.integers(3, 9))) for u in range(n_users)}
    user2val = {u: [int(rng.integers(0, n_items))] for u in range(n_users)}
    user2test = {u: [int(rng.integers(0, n_items))] for u in range(n_users)}
    return cfg, table, user2train, user2val, user2test, n_items


def test_pretrain_step_runs_and_loss_decreases(world):
    cfg, table, user2train, _, _, n_items = world
    model = RecformerForPretraining(cfg)
    ds = SequenceDataset(user2train, max_items=16)
    batch = next(ds.batches(8, drop_last=True))
    item_ids = jnp.asarray(batch.item_ids)
    seq_lens = jnp.asarray(batch.seq_lens)

    # init via a real batch
    from recformer_tpu.data.device_pipeline import make_pretrain_batch

    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=2, total_steps=100)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(cfg, model)

    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(10):
        state, metrics = step(state, rng, table, item_ids, seq_lens)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    # pairs/masking are resampled per step, so compare a head/tail trend
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_encode_all_items_shapes(world):
    cfg, table, *_ , n_items = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        "input_ids": jnp.ones((1, cfg.item_seq_len), jnp.int32),
        "attention_mask": jnp.ones((1, cfg.item_seq_len), jnp.int32),
        "global_attention_mask": jnp.zeros((1, cfg.item_seq_len), jnp.int32).at[:, 0].set(1),
        "token_type_ids": jnp.zeros((1, cfg.item_seq_len), jnp.int32),
        "item_position_ids": jnp.zeros((1, cfg.item_seq_len), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    emb = encode_all_items(params, model, table, cfg, batch_size=8)
    assert emb.shape == (n_items, cfg.hidden_size)
    assert np.isfinite(np.asarray(emb)).all()


def test_encode_all_items_scan_matches_per_chunk(world):
    # nb>1 takes the one-call lax.scan path; a batch size covering the whole
    # catalog (nb==1) takes the per-chunk path — identical embeddings
    cfg, table, *_, n_items = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        "input_ids": jnp.ones((1, cfg.item_seq_len), jnp.int32),
        "attention_mask": jnp.ones((1, cfg.item_seq_len), jnp.int32),
        "global_attention_mask": jnp.zeros((1, cfg.item_seq_len), jnp.int32).at[:, 0].set(1),
        "token_type_ids": jnp.zeros((1, cfg.item_seq_len), jnp.int32),
        "item_position_ids": jnp.zeros((1, cfg.item_seq_len), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    scan_emb = encode_all_items(params, model, table, cfg, batch_size=8)
    one_call = encode_all_items(params, model, table, cfg, batch_size=n_items)
    assert scan_emb.shape == one_call.shape == (n_items, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(scan_emb, np.float32),
                               np.asarray(one_call, np.float32),
                               rtol=0, atol=1e-6)


def test_two_stage_finetune_end_to_end(world):
    cfg, table, user2train, user2val, user2test, n_items = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=2, total_steps=200)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    train_ds = SequenceDataset(user2train, max_items=16)
    val_ds = EvalDataset(user2train, user2val, user2test, "val", max_items=16)
    test_ds = EvalDataset(user2train, user2val, user2test, "test", max_items=16)

    state, item_emb, test_metrics = finetune_two_stage(
        state, model, table, cfg, train_ds, val_ds, test_ds,
        num_epochs=2, batch_size=8, eval_batch_size=8, encode_batch_size=8,
        verbose=1, log=lambda *a: None,
    )
    for key in ("NDCG@10", "Recall@10", "NDCG@50", "Recall@50", "MRR", "AUC"):
        assert key in test_metrics
        assert 0.0 <= test_metrics[key] <= 1.0 + 1e-6


def test_eval_matches_bruteforce_ranker(world):
    """Device eval metrics == numpy brute-force reference (utils.py:82-108).

    Runs in fp32: in bf16, jit-fused vs eager pooled outputs differ in the
    last bits, which flips near-tied ranks and would make an exact
    comparison meaningless."""
    _cfg, table, user2train, user2val, user2test, n_items = world
    cfg = _cfg.replace(dtype="float32")
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    item_emb = encode_all_items(params, model, table, cfg, batch_size=8)
    val_ds = EvalDataset(user2train, user2val, user2test, "val", max_items=16)
    got = evaluate_seqrec(params, model, table, val_ds, item_emb, cfg, batch_size=8)

    # brute force on host
    from recformer_tpu.data.device_pipeline import assemble_for_config
    from recformer_tpu.models.heads import similarity_scores

    ndcg10 = []
    for batch in val_ds.batches(8):
        b = assemble_for_config(table, jnp.asarray(batch.item_ids),
                                jnp.asarray(batch.seq_lens), cfg)
        pooled = model.apply(params, b, deterministic=True)
        scores = np.asarray(similarity_scores(pooled.astype(jnp.float32),
                                              item_emb.astype(jnp.float32), cfg.temp))
        for i in range(scores.shape[0]):
            if not batch.valid[i]:
                continue
            rank = int((scores[i] > scores[i, batch.labels[i]]).sum())
            ndcg10.append((1.0 / np.log2(rank + 2)) if rank < 10 else 0.0)
    np.testing.assert_allclose(got["NDCG@10"], np.mean(ndcg10), rtol=1e-5)


def test_fraud_train_and_eval(world):
    cfg, table, user2train, _, _, n_items = world
    model = RecformerForFraudDetection(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=2, total_steps=100)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_fraud_train_step(cfg, model)

    user_sequences = {u: (seq, [u % 2]) for u, seq in user2train.items()}
    ds = FraudDataset(user_sequences, max_items=16)
    rng = jax.random.PRNGKey(0)
    for batch in ds.batches(8):
        state, metrics = step(state, rng, table, jnp.asarray(batch.item_ids),
                              jnp.asarray(batch.seq_lens), jnp.asarray(batch.labels),
                              jnp.asarray(batch.valid))
        assert np.isfinite(float(metrics["loss"]))

    result = evaluate_fraud(state.params, model, table, ds, cfg, batch_size=8)
    for key in ("accuracy", "balanced_accuracy", "precision", "recall", "f1", "auc", "threshold"):
        assert key in result


def test_roc_auc_known_values():
    probs = np.array([0.9, 0.8, 0.7, 0.6, 0.5, 0.4])
    labels = np.array([1, 1, 1, 0, 0, 0])
    assert roc_auc(probs, labels) == 1.0
    labels2 = np.array([0, 0, 0, 1, 1, 1])
    assert roc_auc(probs, labels2) == 0.0
    # ties -> 0.5
    assert roc_auc(np.full(6, 0.5), labels) == 0.5


def test_multi_step_matches_sequential(world):
    """A scanned k-step call must equal k sequential step calls."""
    from recformer_tpu.training.steps import make_finetune_step, make_multi_step

    cfg, table, user2train, *_ = world
    cfg = cfg.replace(dtype="float32", hidden_dropout_prob=0.0)
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=100)
    item_emb = jax.random.normal(jax.random.PRNGKey(1), (20, cfg.hidden_size))

    ds = SequenceDataset(user2train, max_items=16)
    batches = list(ds.batches(8, drop_last=True))[:2]
    step = make_finetune_step(cfg, model)
    multi = make_multi_step(step, 2)
    rng = jax.random.PRNGKey(2)

    s1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    losses_seq = []
    for b in batches:
        s1, m = step(s1, rng, table, jnp.asarray(b.item_ids), jnp.asarray(b.seq_lens), item_emb)
        losses_seq.append(float(m["loss"]))

    s2 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    ids = jnp.asarray(np.stack([b.item_ids for b in batches]))
    lens = jnp.asarray(np.stack([b.seq_lens for b in batches]))
    s2, metrics = multi(s2, rng, table, ids, lens, item_emb)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses_seq, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_finetune_full_softmax_path(world):
    """finetune_negative_sample_size=0 -> full-catalog CE (models.py:589-591)."""
    from recformer_tpu.training.steps import make_finetune_step

    cfg, table, user2train, *_ = world
    cfg = cfg.replace(finetune_negative_sample_size=0)
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_finetune_step(cfg, model)
    ds = SequenceDataset(user2train, max_items=16)
    batch = next(ds.batches(8, drop_last=True))
    item_emb = jax.random.normal(jax.random.PRNGKey(1), (20, cfg.hidden_size))
    state, metrics = step(state, jax.random.PRNGKey(2), table,
                          jnp.asarray(batch.item_ids), jnp.asarray(batch.seq_lens),
                          item_emb)
    assert np.isfinite(float(metrics["loss"]))


def test_scan_layers_remat_trains(world):
    """scan_layers + remat (the recommended production pairing) trains."""
    cfg, table, user2train, *_ = world
    cfg = cfg.replace(scan_layers=True, remat=True)
    model = RecformerForPretraining(cfg)
    ds = SequenceDataset(user2train, max_items=16)
    batch = next(ds.batches(8, drop_last=True))
    item_ids = jnp.asarray(batch.item_ids)
    seq_lens = jnp.asarray(batch.seq_lens)
    from recformer_tpu.data.device_pipeline import make_pretrain_batch

    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(cfg, model)
    for _ in range(2):
        state, metrics = step(state, jax.random.PRNGKey(1), table, item_ids, seq_lens)
    assert np.isfinite(float(metrics["loss"]))


def test_remat_policy_grads_match_no_remat(world):
    """Selective remat ('save_attention' / 'dots') is a pure scheduling
    choice: gradients must match the no-remat step exactly (same math, XLA
    just recomputes less in backward). Guards the checkpoint_name tagging in
    models/encoder.py against silently changing values."""
    from recformer_tpu.data.device_pipeline import make_pretrain_batch

    cfg, table, user2train, *_ = world
    cfg = cfg.replace(scan_layers=True, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0, dtype="float32")
    ds = SequenceDataset(user2train, max_items=16)
    batch = next(ds.batches(8, drop_last=True))
    item_ids = jnp.asarray(batch.item_ids)
    seq_lens = jnp.asarray(batch.seq_lens)

    def grads_for(c):
        model = RecformerForPretraining(c)
        ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids,
                                     seq_lens, c)
        params = model.init(jax.random.PRNGKey(0), ba, bb)

        def loss_fn(p):
            from recformer_tpu.training import losses
            out = model.apply(p, ba, bb)
            cl, _, _ = losses.info_nce_loss(out.z1, out.z2, c.temp)
            return cl

        return jax.grad(loss_fn)(params)

    ref = grads_for(cfg)
    for policy in ("full", "save_attention", "dots"):
        got = grads_for(cfg.replace(remat=True, remat_policy=policy))
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"policy={policy}")

    with pytest.raises(ValueError):
        cfg.replace(remat_policy="bogus")


def test_encode_all_items_disk_cache(world, tmp_path):
    """cache_path round-trip: miss -> write, hit -> identical embeddings, and
    a params change invalidates via the fingerprint (reference parity:
    finetune.py:277-285, but keyed so a different ckpt re-encodes)."""
    from recformer_tpu.training.loops import encode_all_items

    cfg, table, *_ = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.item_seq_len), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    cache = str(tmp_path / "emb.npz")

    emb1 = encode_all_items(params, model, table, cfg, 8, cache_path=cache)
    assert os.path.exists(cache)
    emb2 = encode_all_items(params, model, table, cfg, 8, cache_path=cache)
    np.testing.assert_array_equal(np.asarray(emb1), np.asarray(emb2))

    params2 = jax.tree.map(lambda x: x + 0.01, params)
    emb3 = encode_all_items(params2, model, table, cfg, 8, cache_path=cache)
    assert not np.array_equal(np.asarray(emb1), np.asarray(emb3))
    # and the cache now holds the new params' result
    emb4 = encode_all_items(params2, model, table, cfg, 8, cache_path=cache)
    np.testing.assert_array_equal(np.asarray(emb3), np.asarray(emb4))


def test_two_stage_finetune_resume_equivalence(world, tmp_path):
    """Interrupt the two-stage loop mid-stage-2, resume from the rolling
    checkpoint, and get bit-identical test metrics to an uninterrupted run
    (epoch replay is deterministic: per-epoch shuffles are seed(epoch), the
    step rng folds in state.step)."""
    cfg, table, user2train, user2val, user2test, n_items = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }

    def fresh_state():
        params = model.init(jax.random.PRNGKey(0), dummy)
        tx = create_optimizer(learning_rate=1e-3, warmup_steps=2,
                              total_steps=200)
        return TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    train_ds = SequenceDataset(user2train, max_items=16)
    val_ds = EvalDataset(user2train, user2val, user2test, "val", max_items=16)
    test_ds = EvalDataset(user2train, user2val, user2test, "test", max_items=16)
    kw = dict(num_epochs=2, batch_size=8, eval_batch_size=8,
              encode_batch_size=8, verbose=1)

    _, _, ref = finetune_two_stage(
        fresh_state(), model, table, cfg, train_ds, val_ds, test_ds,
        log=lambda *a: None, **kw)

    class Interrupt(Exception):
        pass

    def interrupting_log(msg):
        if "[stage2]" in str(msg):
            raise Interrupt  # die mid-stage-2, before that epoch checkpoints

    rdir = str(tmp_path / "loop_state")
    with pytest.raises(Interrupt):
        finetune_two_stage(
            fresh_state(), model, table, cfg, train_ds, val_ds, test_ds,
            resume_dir=rdir, log=interrupting_log, **kw)
    assert os.path.exists(os.path.join(rdir, "loop.json"))

    logs = []
    _, _, resumed = finetune_two_stage(
        fresh_state(), model, table, cfg, train_ds, val_ds, test_ds,
        resume_dir=rdir, log=logs.append, **kw)
    assert any("resumed at stage 2" in str(m) for m in logs)
    assert resumed == ref


def test_mirror_file_survives_midstage_death(world, tmp_path):
    """VERDICT r4 weak #5: a VM recycle that wipes the run directory must
    lose no *numbers*. Kill the loop mid-stage-2, delete the whole volatile
    run dir, and every dev row produced so far must still be in the durable
    mirror JSONL; a completed run appends its test row there too."""
    import json as _json

    cfg, table, user2train, user2val, user2test, n_items = world
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }

    def fresh_state():
        params = model.init(jax.random.PRNGKey(0), dummy)
        tx = create_optimizer(learning_rate=1e-3, warmup_steps=2,
                              total_steps=200)
        return TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    train_ds = SequenceDataset(user2train, max_items=16)
    val_ds = EvalDataset(user2train, user2val, user2test, "val", max_items=16)
    test_ds = EvalDataset(user2train, user2val, user2test, "test", max_items=16)
    kw = dict(num_epochs=2, batch_size=8, eval_batch_size=8,
              encode_batch_size=8, verbose=1)

    mirror = str(tmp_path / "durable" / "dev.jsonl")
    rdir = str(tmp_path / "volatile" / "loop_state")

    class Interrupt(Exception):
        pass

    def interrupting_log(msg):
        if "[stage2]" in str(msg):
            raise Interrupt

    with pytest.raises(Interrupt):
        finetune_two_stage(
            fresh_state(), model, table, cfg, train_ds, val_ds, test_ds,
            resume_dir=rdir, mirror_path=mirror, log=interrupting_log, **kw)

    import shutil
    shutil.rmtree(str(tmp_path / "volatile"))  # the recycle

    rows = [_json.loads(l) for l in open(mirror)]
    stage1 = [r for r in rows if r["event"] == "dev" and r["stage"] == 1]
    assert len(stage1) == kw["num_epochs"]  # verbose=1: every epoch mirrored
    assert all("NDCG@10" in r for r in stage1)
    assert not any(r["event"] == "test" for r in rows)

    _, _, test_metrics = finetune_two_stage(
        fresh_state(), model, table, cfg, train_ds, val_ds, test_ds,
        mirror_path=mirror, log=lambda *a: None, **kw)
    rows = [_json.loads(l) for l in open(mirror)]
    test_rows = [r for r in rows if r["event"] == "test"]
    assert len(test_rows) == 1
    assert test_rows[0]["NDCG@10"] == test_metrics["NDCG@10"]


def test_eval_scan_chunking_matches_single_group(world):
    """Chunked-group eval (scan_chunk < nb, tail padded with all-invalid
    filler batches) must reproduce the one-group result exactly, for both the
    ranked eval and the fraud prob sweep (advisor r2: groups give coarse
    progress through relay hangs without changing the math)."""
    _cfg, table, user2train, user2val, user2test, n_items = world
    cfg = _cfg.replace(dtype="float32")
    model = RecformerForSeqRec(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    item_emb = encode_all_items(params, model, table, cfg, batch_size=8)
    val_ds = EvalDataset(user2train, user2val, user2test, "val", max_items=16)
    # batch_size 4 -> 6 batches; chunk 2 -> 3 groups; chunk 4 -> padded tail
    whole = evaluate_seqrec(params, model, table, val_ds, item_emb, cfg,
                            batch_size=4, scan_chunk=32)
    for chunk in (2, 4):
        got = evaluate_seqrec(params, model, table, val_ds, item_emb, cfg,
                              batch_size=4, scan_chunk=chunk)
        assert got.keys() == whole.keys()
        for k in whole:
            np.testing.assert_allclose(got[k], whole[k], rtol=1e-6, err_msg=k)

    fmodel = RecformerForFraudDetection(cfg)
    fparams = fmodel.init(jax.random.PRNGKey(1), dummy)
    user_sequences = {u: (seq, [u % 2]) for u, seq in user2train.items()}
    ds = FraudDataset(user_sequences, max_items=16)
    whole_f = evaluate_fraud(fparams, fmodel, table, ds, cfg, batch_size=4,
                             scan_chunk=32)
    for chunk in (2, 4):
        got_f = evaluate_fraud(fparams, fmodel, table, ds, cfg, batch_size=4,
                               scan_chunk=chunk)
        assert got_f == whole_f


def test_multi_step_scan_extras_matches_sequential_fraud(world):
    """make_multi_step(scan_extras=2): scanned fraud steps (labels + valid
    stacked per step) must equal sequential step calls."""
    from recformer_tpu.training.steps import make_fraud_train_step, make_multi_step

    cfg, table, user2train, *_ = world
    cfg = cfg.replace(dtype="float32", hidden_dropout_prob=0.0)
    model = RecformerForFraudDetection(cfg)
    dummy = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), dummy)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=100)
    user_sequences = {u: (seq, [u % 2]) for u, seq in user2train.items()}
    ds = FraudDataset(user_sequences, max_items=16)
    batches = list(ds.batches(8))[:2]
    step = make_fraud_train_step(cfg, model)
    multi = make_multi_step(step, 2, scan_extras=2)
    rng = jax.random.PRNGKey(2)

    s1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    losses_seq = []
    for b in batches:
        s1, m = step(s1, rng, table, jnp.asarray(b.item_ids), jnp.asarray(b.seq_lens),
                     jnp.asarray(b.labels), jnp.asarray(b.valid))
        losses_seq.append(float(m["loss"]))

    s2 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    s2, metrics = multi(
        s2, rng, table,
        jnp.asarray(np.stack([b.item_ids for b in batches])),
        jnp.asarray(np.stack([b.seq_lens for b in batches])),
        jnp.asarray(np.stack([b.labels for b in batches])),
        jnp.asarray(np.stack([b.valid for b in batches])))
    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses_seq, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
