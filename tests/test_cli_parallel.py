"""Driver-reachable parallelism: one CLI invocation test per mode.

The reference exposes its (single) distribution strategy as one trainer flag
(`/root/reference/lightning_pretrain.py:137-143`); these tests pin the same
one-flag reachability for every mode this framework adds — TP / PP / SP must
be invocable from `cli.pretrain` end to end, not just importable as library
modules. Runs on the 8-virtual-device CPU mesh (conftest).
"""

import json
import os

import numpy as np
import pytest

from recformer_tpu.utils.io import write_json


@pytest.fixture(scope="module")
def pretrain_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("ppdata")
    rng = np.random.default_rng(3)
    words = ["red", "blue", "bolt", "nut", "gear", "led", "cap", "fan"]
    n_items = 25
    meta = {
        f"I{i:03d}": {"make": words[i % len(words)],
                      "hue": words[(i * 3 + 1) % len(words)]}
        for i in range(n_items)
    }
    smap = {f"I{i:03d}": i for i in range(n_items)}
    seqs = [[int(x) for x in rng.integers(0, n_items, size=rng.integers(3, 8))]
            for _ in range(24)]
    write_json(seqs, str(root / "train.json"))
    write_json(seqs[:8], str(root / "dev.json"))
    write_json(meta, str(root / "meta_data.json"))
    write_json(smap, str(root / "smap.json"))
    return root


def _run(pretrain_data, tmp_path, *extra):
    from recformer_tpu.cli.pretrain import main

    out = tmp_path / "out"
    main([
        "--data_path", str(pretrain_data),
        "--output_dir", str(out),
        "--model_size", "tiny",
        "--num_train_epochs", "1",
        "--batch_size", "2",
        "--gradient_accumulation_steps", "1",
        "--warmup_steps", "2",
        "--valid_step_interval", "2",
        *extra,
    ])
    assert (out / "last").exists()
    assert (out / "config.json").exists()
    with open(out / "logs" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f]
    # interval=2 with 3 steps/epoch: mid-epoch validation must have fired
    accs = [r["dev_accuracy"] for r in rows if "dev_accuracy" in r]
    assert accs and all(np.isfinite(a) for a in accs)
    return out


def test_pretrain_cli_tensor_parallel(pretrain_data, tmp_path):
    _run(pretrain_data, tmp_path, "--tensor_parallel", "2")


def test_pretrain_cli_pipeline(pretrain_data, tmp_path):
    _run(pretrain_data, tmp_path, "--pipeline", "2", "--microbatches", "2",
         "--scan_layers")


def test_pretrain_cli_sequence_parallel(pretrain_data, tmp_path):
    _run(pretrain_data, tmp_path, "--attention_impl", "sequence_parallel",
         "--sequence_parallel", "2")


def test_pretrain_cli_mode_validation(pretrain_data, tmp_path):
    from recformer_tpu.cli.pretrain import main

    base = ["--data_path", str(pretrain_data), "--output_dir",
            str(tmp_path / "x"), "--model_size", "tiny"]
    with pytest.raises(SystemExit):
        main(base + ["--tensor_parallel", "2", "--pipeline", "2"])
    with pytest.raises(SystemExit):  # PP needs stacked layers
        main(base + ["--pipeline", "2"])
    with pytest.raises(SystemExit):  # SP impl and axis size go together
        main(base + ["--attention_impl", "sequence_parallel"])
    with pytest.raises(SystemExit):  # zero composes with plain DP only
        main(base + ["--tensor_parallel", "2", "--zero"])
