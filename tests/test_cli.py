"""End-to-end driver tests: synthetic artifacts -> finetune / evaluate /
fraud / cluster drivers (tiny model, CPU)."""

import json
import os

import numpy as np
import pytest

from recformer_tpu.utils.io import write_json


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Synthetic finetune-artifact directory matching the reference contract."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    n_items, n_users = 25, 20
    words = ["red", "blue", "bolt", "nut", "gear", "led", "cap", "fan"]
    meta = {
        f"I{i:03d}": {"make": words[i % len(words)], "hue": words[(i * 3 + 1) % len(words)]}
        for i in range(n_items)
    }
    smap = {f"I{i:03d}": i for i in range(n_items)}
    train, val, test = {}, {}, {}
    for u in range(n_users):
        seq = list(rng.integers(0, n_items, size=rng.integers(4, 9)))
        train[u] = [int(x) for x in seq[:-2]]
        val[u] = [int(seq[-2])]
        test[u] = [int(seq[-1])]
    write_json(train, str(root / "train.json"))
    write_json(val, str(root / "val.json"))
    write_json(test, str(root / "test.json"))
    write_json(meta, str(root / "meta_data.json"))
    write_json(smap, str(root / "smap.json"))
    return root


def test_finetune_driver_end_to_end(artifacts, tmp_path):
    from recformer_tpu.cli.finetune import main

    out = tmp_path / "ckpt"
    metrics = main([
        "--data_path", str(artifacts),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--encode_batch_size", "8",
        "--verbose", "1",
        "--gradient_accumulation_steps", "1",
        "--finetune_negative_sample_size", "5",
    ])
    assert "NDCG@10" in metrics
    name = os.path.basename(os.path.normpath(str(artifacts)))
    assert (out / name / "test_metrics.json").exists()
    assert (out / name / "config.json").exists()


def test_evaluate_driver(artifacts, tmp_path):
    from recformer_tpu.cli.evaluate_seq import main

    out_file = tmp_path / "metrics.json"
    metrics = main([
        "--data_path", str(artifacts),
        "--ckpt", "",  # random init zero-shot
        "--model_size", "tiny",
        "--batch_size", "8",
        "--encode_batch_size", "8",
        "--output_file", str(out_file),
    ])
    assert "Recall@10" in metrics
    assert out_file.exists()


def test_evaluate_driver_sharded_matches_gspmd(artifacts, tmp_path):
    """--sharded_eval (explicit shard_map rank, VERDICT r4 weak #6) must
    reproduce the default GSPMD path's metrics on the same checkpoint."""
    from recformer_tpu.cli.evaluate_seq import main

    common = [
        "--data_path", str(artifacts),
        "--ckpt", "",
        "--model_size", "tiny",
        "--batch_size", "8",
        "--encode_batch_size", "8",
    ]
    dense = main(common)
    sharded = main(common + ["--sharded_eval", "4"])
    for k in dense:
        assert abs(dense[k] - sharded[k]) < 1e-4, (k, dense[k], sharded[k])


def test_cluster_driver(artifacts, tmp_path):
    from recformer_tpu.cli.cluster import main

    out = tmp_path / "clusters"
    stats = main([
        "--data_path", str(artifacts),
        "--model_size", "tiny",
        "--batch_size", "8",
        "--min_clusters", "2",
        "--max_clusters", "3",
        "--output_dir", str(out),
    ])
    assert len(stats) >= 2
    assert (out / "cluster_stats.json").exists()
    assert (out / "k_sweep.json").exists()
    assert (out / "pca_2d.npy").exists()
    # analytics figures (reference cluster.py:108-181)
    assert (out / "k_sweep.png").exists()
    assert (out / "clusters_2d.png").exists()


def test_fraud_driver(artifacts, tmp_path):
    from recformer_tpu.cli.finetune_classification import main

    rng = np.random.default_rng(1)
    root = tmp_path / "fraud_data"
    os.makedirs(root)
    for name in ("train.json", "val.json", "test.json"):
        data = {}
        for u in range(12):
            seq = [int(x) for x in rng.integers(0, 25, size=rng.integers(3, 7))]
            data[u] = [seq, [int(rng.random() < 0.3)]]
        write_json(data, str(root / name))
    # share the item metadata
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    out = tmp_path / "fraud_out"
    metrics = main([
        "--data_path", str(root),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
    ])
    assert "f1" in metrics and "auc" in metrics


def test_pretrain_driver_end_to_end(artifacts, tmp_path):
    from recformer_tpu.cli.pretrain import main
    import json

    root = tmp_path / "pretrain_data"
    os.makedirs(root)
    rng = np.random.default_rng(2)
    seqs = [[int(x) for x in rng.integers(0, 25, size=rng.integers(3, 8))]
            for _ in range(24)]
    write_json(seqs, str(root / "train.json"))
    write_json(seqs[:8], str(root / "dev.json"))
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    out = tmp_path / "pre_out"
    main([
        "--data_path", str(root),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "8",
        "--gradient_accumulation_steps", "1",
        "--warmup_steps", "2",
        "--valid_step_interval", "100",
        "--steps_per_call", "1",
    ])
    assert (out / "last").exists()
    assert (out / "state").exists()
    assert (out / "config.json").exists()
    # resume path restores without error
    main([
        "--data_path", str(root),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "8",
        "--gradient_accumulation_steps", "1",
        "--warmup_steps", "2",
        "--valid_step_interval", "100",
        "--resume",
    ])


def test_serve_driver(artifacts, tmp_path):
    from recformer_tpu.cli.serve import main

    rng = np.random.default_rng(5)
    seqs = {f"u{i}": [int(x) for x in rng.integers(0, 25, size=5)] for i in range(6)}
    seq_file = tmp_path / "sequences.json"
    write_json(seqs, str(seq_file))
    out_file = tmp_path / "recs.jsonl"
    n = main([
        "--data_path", str(artifacts),
        "--sequences", str(seq_file),
        "--model_size", "tiny",
        "--top_k", "5",
        "--batch_size", "4",
        "--encode_batch_size", "8",
        "--output", str(out_file),
    ])
    assert n == 6
    rows = [json.loads(l) for l in open(out_file)]
    assert len(rows) == 6
    assert all(len(r["items"]) == 5 for r in rows)
    # scores descending
    for r in rows:
        assert r["scores"] == sorted(r["scores"], reverse=True)


def test_finetune_fix_word_embedding(artifacts, tmp_path):
    """--fix_word_embedding keeps the word table bitwise frozen."""
    import jax
    import jax.numpy as jnp

    from recformer_tpu.cli.finetune import main
    from recformer_tpu.training.checkpoint import restore_params

    out = tmp_path / "ckpt_frozen"
    main([
        "--data_path", str(artifacts),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "8",
        "--eval_batch_size", "8",
        "--encode_batch_size", "8",
        "--verbose", "1",
        "--gradient_accumulation_steps", "1",
        "--finetune_negative_sample_size", "5",
        "--learning_rate", "0.01",
        "--fix_word_embedding",
        "--seed", "7",
    ])
    name = os.path.basename(os.path.normpath(str(artifacts)))
    saved = restore_params(str(out / name / "best_model"))
    # compare against a fresh init with the same seed path: word embeddings
    # must equal their init (training moved everything else)
    from recformer_tpu.cli.common import build_config, init_model_params
    from recformer_tpu.models.heads import RecformerForSeqRec
    import argparse

    ns = argparse.Namespace(model_size="tiny", temp=0.05,
                            finetune_negative_sample_size=5, attention_impl=None)
    cfg = build_config(ns, item_num=25)
    model = RecformerForSeqRec(cfg)
    fresh = init_model_params(model, cfg)
    got = saved["params"]["longformer"]["embeddings"]["word_embeddings"]["embedding"]
    init = fresh["params"]["longformer"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(init))
    # sanity: some other param moved
    a = saved["params"]["longformer"]["embeddings"]["item_position_embeddings"]["embedding"]
    b = fresh["params"]["longformer"]["embeddings"]["item_position_embeddings"]["embedding"]
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_steps_per_call_validation_fires(artifacts, tmp_path):
    """steps_per_call=3 with valid_step_interval=4: the counter strides 3, 6,
    ... and never hits a multiple of 4 — validation/top-k must fire on
    *crossing* the interval, and scanned-call metrics must be real traces
    (pretrain.py round-1 defects: `% == 0` gate + fabricated accuracy=0)."""
    from recformer_tpu.cli.pretrain import _crossed, main

    assert _crossed(4, 3, 6) and not _crossed(4, 0, 3) and not _crossed(4, 6, 6)
    assert _crossed(4, 7, 8)

    root = tmp_path / "pretrain_data"
    os.makedirs(root)
    rng = np.random.default_rng(3)
    seqs = [[int(x) for x in rng.integers(0, 25, size=rng.integers(3, 8))]
            for _ in range(24)]
    write_json(seqs, str(root / "train.json"))
    write_json(seqs[:8], str(root / "dev.json"))
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    out = tmp_path / "pre_out_spc"
    main([
        "--data_path", str(root),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "2",  # 3 steps/epoch at global batch 8
        "--batch_size", "1",  # x8 virtual devices (conftest) = global 8
        "--gradient_accumulation_steps", "1",
        "--warmup_steps", "2",
        "--valid_step_interval", "4",
        "--steps_per_call", "3",
    ])
    rows = [json.loads(l) for l in open(out / "logs" / "metrics.jsonl")]
    dev_rows = [r for r in rows if "dev_accuracy" in r]
    # steps 3 -> 6 crossed 4: exactly one mid-epoch validation fired
    assert len(dev_rows) == 1 and dev_rows[0]["step"] == 6
    # top-k checkpoints were written by that firing (plus epoch ends)
    assert (out / "topk").exists() and any((out / "topk").iterdir())


def test_pretrain_preemption_checkpoint(artifacts, tmp_path, monkeypatch):
    """Failure recovery: a SIGTERM-style preemption checkpoints the FULL
    TrainState at the next step boundary, exits cleanly, and --resume
    continues from the saved optimizer step."""
    import signal as _signal

    from recformer_tpu.cli import pretrain as P

    # the real handler: installs, latches the signal, restores cleanly
    old_term = _signal.getsignal(_signal.SIGTERM)
    old_int = _signal.getsignal(_signal.SIGINT)
    try:
        flag = P._install_preemption_handler()
        assert flag["signal"] == 0
        os.kill(os.getpid(), _signal.SIGTERM)
        assert flag["signal"] == _signal.SIGTERM
    finally:
        _signal.signal(_signal.SIGTERM, old_term)
        _signal.signal(_signal.SIGINT, old_int)

    root = tmp_path / "pretrain_data"
    os.makedirs(root)
    rng = np.random.default_rng(4)
    seqs = [[int(x) for x in rng.integers(0, 25, size=rng.integers(3, 8))]
            for _ in range(24)]
    write_json(seqs, str(root / "train.json"))
    write_json(seqs[:8], str(root / "dev.json"))
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    class TripAfter(dict):
        """Reads as un-signalled for the first n step-boundary checks."""

        def __init__(self, n):
            super().__init__(signal=0)
            self.reads = 0
            self.n = n

        def __getitem__(self, k):
            self.reads += 1
            return 15 if self.reads > self.n else 0

    monkeypatch.setattr(P, "_install_preemption_handler",
                        lambda: TripAfter(4))
    out = tmp_path / "pre_out_preempt"
    common = [
        "--data_path", str(root), "--output_dir", str(out),
        "--model_size", "tiny", "--batch_size", "1",
        "--gradient_accumulation_steps", "1", "--warmup_steps", "2",
        "--valid_step_interval", "100",
    ]
    # 3 steps/epoch x 4 epochs; the 5th boundary check trips -> stop at step 5
    P.main(common + ["--num_train_epochs", "4"])
    assert (out / "state").exists() and (out / "last").exists()
    rows = [json.loads(l) for l in open(out / "logs" / "metrics.jsonl")]
    assert any(r.get("preempted") for r in rows)
    from recformer_tpu.training.checkpoint import restore_train_state
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.cli.common import init_model_params

    cfg = RecformerConfig.tiny(item_num=25)
    model = RecformerForPretraining(cfg)
    params = init_model_params(model, cfg, with_mlm=True)
    tx = create_optimizer(learning_rate=5e-5, warmup_steps=2, total_steps=100)
    st = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    st = restore_train_state(str(out / "state"), st)
    assert int(st.step) == 5

    # --resume picks the state up and runs to completion
    monkeypatch.setattr(P, "_install_preemption_handler",
                        lambda: {"signal": 0})
    P.main(common + ["--num_train_epochs", "1", "--resume"])
    assert (out / "config.json").exists()


def test_fraud_driver_resume(artifacts, tmp_path, monkeypatch):
    """Interrupt the fraud finetune after its first epoch checkpoint, resume
    with --resume, and get the same test metrics as an uninterrupted run."""
    from recformer_tpu.cli import finetune_classification as F

    rng = np.random.default_rng(7)
    root = tmp_path / "fraud_data"
    os.makedirs(root)
    for name in ("train.json", "val.json", "test.json"):
        data = {}
        for u in range(12):
            seq = [int(x) for x in rng.integers(0, 25, size=rng.integers(3, 7))]
            data[u] = [seq, [int(rng.random() < 0.3)]]
        write_json(data, str(root / name))
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    common = ["--data_path", str(root), "--model_size", "tiny",
              "--num_train_epochs", "2", "--batch_size", "8",
              "--eval_batch_size", "8"]

    ref = F.main(common + ["--output_dir", str(tmp_path / "ref_out")])

    real_eval = F.evaluate_fraud
    calls = {"n": 0}

    def failing_eval(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch-1 dev eval: die after epoch 0 checkpointed
            raise RuntimeError("simulated preemption")
        return real_eval(*a, **kw)

    out = tmp_path / "resume_out"
    monkeypatch.setattr(F, "evaluate_fraud", failing_eval)
    with pytest.raises(RuntimeError):
        F.main(common + ["--output_dir", str(out)])
    name = os.path.basename(str(root))
    assert (out / name / "loop_state" / "loop.json").exists()

    monkeypatch.setattr(F, "evaluate_fraud", real_eval)
    # fresh launch without --resume must refuse
    with pytest.raises(SystemExit):
        F.main(common + ["--output_dir", str(out)])
    resumed = F.main(common + ["--output_dir", str(out), "--resume"])
    assert resumed == ref
    assert not (out / name / "loop_state").exists()  # cleaned on completion


def test_fraud_resume_refuses_optimizer_recipe_change(artifacts, tmp_path):
    """A loop_state saved under one optimizer recipe must not be restored
    into a different one: head_lr switches the opt_state to a
    multi_transform structure and restore would unflatten old leaves into
    the wrong tree (advisor r3). The driver records the recipe in loop.json
    and refuses a mismatched --resume."""
    from recformer_tpu.cli import finetune_classification as F

    rng = np.random.default_rng(9)
    root = tmp_path / "fraud_data"
    os.makedirs(root)
    for name in ("train.json", "val.json", "test.json"):
        data = {}
        for u in range(10):
            seq = [int(x) for x in rng.integers(0, 25, size=rng.integers(3, 6))]
            data[u] = [seq, [int(rng.random() < 0.3)]]
        write_json(data, str(root / name))
    for f in ("meta_data.json", "smap.json"):
        write_json(json.load(open(artifacts / f)), str(root / f))

    out = tmp_path / "out"
    dname = os.path.basename(str(root))
    loop_dir = out / dname / "loop_state"
    os.makedirs(loop_dir)
    with open(loop_dir / "loop.json", "w") as f:
        json.dump({"epoch": 0, "best_f1": 0.0, "patience": 3,
                   "recipe": {"learning_rate": 5e-5, "head_lr": None},
                   "epoch_metrics": []}, f)

    common = ["--data_path", str(root), "--model_size", "tiny",
              "--num_train_epochs", "1", "--batch_size", "8",
              "--eval_batch_size", "8", "--output_dir", str(out)]
    with pytest.raises(SystemExit, match="recipe"):
        F.main(common + ["--resume", "--head_lr", "1e-3"])
