"""Checkpoint round-trip and torch-state-dict import tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.models.heads import RecformerForPretraining, RecformerForSeqRec
from recformer_tpu.training.checkpoint import (
    _flatten,
    import_torch_state_dict,
    restore_params,
    save_params,
)


@pytest.fixture(scope="module")
def cfg():
    return RecformerConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    model = RecformerForPretraining(cfg)
    B, L = 2, cfg.max_token_num
    batch = {
        k: jnp.zeros((B, L), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    # include MLM inputs so the lm_head is materialized at init
    batch["mlm_input_ids"] = batch["input_ids"]
    batch["mlm_positions"] = jnp.zeros((B, 4), jnp.int32)
    return model.init(jax.random.PRNGKey(0), batch, batch)


def test_orbax_roundtrip(tmp_path, params):
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = restore_params(path, template=params)
    a = _flatten(jax.tree.map(np.asarray, params))
    b = _flatten(jax.tree.map(np.asarray, restored))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def fake_torch_state_dict(cfg, rng):
    """A minimal HF-Longformer-shaped state dict matching the tiny config."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {
        "longformer.embeddings.word_embeddings.weight": rng.standard_normal((V, H)),
        "longformer.embeddings.position_embeddings.weight": rng.standard_normal(
            (cfg.max_position_embeddings, H)),
        # HF longformer has a 1-row token-type table: must be SKIPPED (shape mismatch)
        "longformer.embeddings.token_type_embeddings.weight": rng.standard_normal((1, H)),
        "longformer.embeddings.LayerNorm.weight": rng.standard_normal(H),
        "longformer.embeddings.LayerNorm.bias": rng.standard_normal(H),
        "lm_head.dense.weight": rng.standard_normal((H, H)),
        "lm_head.dense.bias": rng.standard_normal(H),
        "lm_head.layer_norm.weight": rng.standard_normal(H),
        "lm_head.layer_norm.bias": rng.standard_normal(H),
        "lm_head.bias": rng.standard_normal(V),
        # an HF-only name with no counterpart
        "longformer.embeddings.position_ids": np.arange(10),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"longformer.encoder.layer.{i}"
        for proj in ("query", "key", "value", "query_global", "key_global", "value_global"):
            sd[f"{p}.attention.self.{proj}.weight"] = rng.standard_normal((H, H))
            sd[f"{p}.attention.self.{proj}.bias"] = rng.standard_normal(H)
        sd[f"{p}.attention.output.dense.weight"] = rng.standard_normal((H, H))
        sd[f"{p}.attention.output.dense.bias"] = rng.standard_normal(H)
        sd[f"{p}.attention.output.LayerNorm.weight"] = rng.standard_normal(H)
        sd[f"{p}.attention.output.LayerNorm.bias"] = rng.standard_normal(H)
        sd[f"{p}.intermediate.dense.weight"] = rng.standard_normal((I, H))
        sd[f"{p}.intermediate.dense.bias"] = rng.standard_normal(I)
        sd[f"{p}.output.dense.weight"] = rng.standard_normal((H, I))
        sd[f"{p}.output.dense.bias"] = rng.standard_normal(H)
        sd[f"{p}.output.LayerNorm.weight"] = rng.standard_normal(H)
        sd[f"{p}.output.LayerNorm.bias"] = rng.standard_normal(H)
    return sd


def test_torch_import(cfg, params):
    rng = np.random.default_rng(0)
    sd = fake_torch_state_dict(cfg, rng)
    new_params, copied, skipped = import_torch_state_dict(sd, params, verbose=False)

    # token-type (1 row vs 4) and position_ids must be skipped
    assert any("token_type_embeddings" in s for s in skipped)
    assert any("position_ids" in s for s in skipped)
    # everything else copied
    assert len(copied) == len(sd) - 2

    flat = _flatten(new_params["params"])
    np.testing.assert_allclose(
        flat[("longformer", "embeddings", "word_embeddings", "embedding")],
        sd["longformer.embeddings.word_embeddings.weight"].astype(np.float32),
    )
    # dense kernels are transposed
    np.testing.assert_allclose(
        flat[("longformer", "encoder", "layer_0", "attention", "self", "query", "kernel")],
        sd["longformer.encoder.layer.0.attention.self.query.weight"].T.astype(np.float32),
    )
    # untouched params remain at init
    old = _flatten(params["params"])
    np.testing.assert_array_equal(
        flat[("longformer", "embeddings", "token_type_embeddings", "embedding")],
        np.asarray(old[("longformer", "embeddings", "token_type_embeddings", "embedding")]),
    )


def test_import_into_seqrec_subset(cfg):
    """A SeqRec model (no lm_head) imports the backbone subset cleanly —
    the reference's strict=False load (``finetune.py:269``)."""
    model = RecformerForSeqRec(cfg)
    B, L = 1, cfg.max_token_num
    batch = {
        k: jnp.zeros((B, L), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    rng = np.random.default_rng(0)
    sd = fake_torch_state_dict(cfg, rng)
    new_params, copied, skipped = import_torch_state_dict(sd, params, verbose=False)
    # lm_head names have no home here -> skipped, backbone still lands
    assert any(s.startswith("lm_head") for s in skipped)
    flat = _flatten(new_params["params"])
    np.testing.assert_allclose(
        flat[("longformer", "embeddings", "word_embeddings", "embedding")],
        sd["longformer.embeddings.word_embeddings.weight"].astype(np.float32),
    )


def test_merge_params_partial(cfg, params):
    """merge_params = flax strict=False: shared subtree transfers, heads stay."""
    from recformer_tpu.training.checkpoint import merge_params

    model = RecformerForSeqRec(cfg)
    import jax.numpy as jnp

    batch = {
        k: jnp.zeros((1, cfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    sr_params = model.init(jax.random.PRNGKey(7), batch)
    merged = merge_params(params, sr_params, verbose=False)
    a = _flatten(jax.tree.map(np.asarray, merged["params"]))
    b = _flatten(jax.tree.map(np.asarray, params["params"]))
    key = ("longformer", "embeddings", "word_embeddings", "embedding")
    np.testing.assert_array_equal(a[key], b[key])


def test_train_state_roundtrip(tmp_path, cfg, params):
    from recformer_tpu.training.checkpoint import restore_train_state, save_train_state
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState

    tx = create_optimizer(total_steps=10)
    state = TrainState.create(apply_fn=lambda *a: None, params=params, tx=tx)
    state = state.replace(step=5)
    path = str(tmp_path / "state")
    save_train_state(path, state)
    fresh = TrainState.create(apply_fn=lambda *a: None, params=jax.tree.map(
        lambda x: np.zeros_like(x), params), tx=tx)
    restored = restore_train_state(path, fresh)
    assert int(restored.step) == 5
    a = _flatten(jax.tree.map(np.asarray, restored.params))
    b = _flatten(jax.tree.map(np.asarray, params))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_convert_ckpt_driver(tmp_path, cfg, params):
    from recformer_tpu.cli.convert_ckpt import main
    from recformer_tpu.training.checkpoint import restore_params, save_params

    src = str(tmp_path / "src")
    save_params(src, params)
    out = str(tmp_path / "out")
    cfg_path = str(tmp_path / "config.json")
    cfg.save(cfg_path)
    main(["--pretrain_ckpt", src, "--output_dir", out, "--config", cfg_path])
    for name in ("recformer", "seqrec", "fraud"):
        restored = restore_params(f"{out}/{name}")
        assert "params" in restored


def test_torch_import_into_scan_layers(cfg):
    """HF import works into the stacked (scan_layers) layout."""
    import jax.numpy as jnp

    scfg = cfg.replace(scan_layers=True)
    model = RecformerForSeqRec(scfg)
    batch = {
        k: jnp.zeros((1, scfg.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    rng = np.random.default_rng(0)
    sd = fake_torch_state_dict(cfg, rng)
    new_params, copied, skipped = import_torch_state_dict(sd, params, verbose=False)
    flat = _flatten(jax.tree.map(np.asarray, new_params["params"]))
    q = flat[("longformer", "encoder", "layers", "layer", "attention", "self",
              "query", "kernel")]
    assert q.shape[0] == cfg.num_hidden_layers
    np.testing.assert_allclose(
        q[1], sd["longformer.encoder.layer.1.attention.self.query.weight"].T,
        rtol=1e-6)


def test_topk_checkpoint_manager(tmp_path, params):
    import os

    from recformer_tpu.training.checkpoint import TopKCheckpointManager

    small = {"w": np.ones(3)}
    mgr = TopKCheckpointManager(str(tmp_path / "topk"), k=2, mode="max")
    assert mgr.save(small, 1, 0.5) is not None
    assert mgr.save(small, 2, 0.7) is not None
    assert mgr.save(small, 3, 0.3) is None  # worse than both, at capacity
    p = mgr.save(small, 4, 0.9)
    assert p is not None
    kept = sorted(os.listdir(tmp_path / "topk"))
    assert len(kept) == 2
    assert any("0.900000" in k for k in kept)
    assert any("0.700000" in k for k in kept)
    assert "0.900000" in mgr.best_path()
    # reload from disk
    mgr2 = TopKCheckpointManager(str(tmp_path / "topk"), k=2, mode="max")
    assert "0.900000" in mgr2.best_path()
