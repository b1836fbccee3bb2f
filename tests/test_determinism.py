"""Determinism: identical seeds produce identical training trajectories
(the reference relies on ``seed_everything(42)`` — SURVEY §5.2; here the
guarantee is structural: all randomness flows through explicit PRNG keys)."""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_table
from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.device_pipeline import make_pretrain_batch
from recformer_tpu.models.heads import RecformerForPretraining
from recformer_tpu.training.optimizer import create_optimizer
from recformer_tpu.training.steps import TrainState, make_pretrain_step
from recformer_tpu.utils.logging import MetricsLogger


def test_pretrain_steps_are_deterministic():
    cfg = RecformerConfig.tiny(
        max_token_num=32, item_seq_len=16, max_item_embeddings=4,
        attention_window=(8, 8),
    )
    table = _synthetic_table(cfg, 10)
    rng_np = np.random.default_rng(0)
    item_ids = jnp.asarray(rng_np.integers(0, 10, size=(4, 6)).astype(np.int32))
    seq_lens = jnp.asarray(rng_np.integers(2, 7, size=4).astype(np.int32))

    model = RecformerForPretraining(cfg)
    ba, bb = make_pretrain_batch(jax.random.PRNGKey(0), table, item_ids, seq_lens, cfg)
    params = model.init(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    step = make_pretrain_step(cfg, model)

    def run():
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        losses = []
        for _ in range(3):
            state, m = step(state, jax.random.PRNGKey(7), table, item_ids, seq_lens)
            losses.append(float(m["loss"]))
        return losses

    assert run() == run()


def test_metrics_logger(tmp_path):
    import json

    log = MetricsLogger(str(tmp_path))
    log.log(1, {"loss": 1.5, "accuracy": jnp.asarray(0.25)})
    log.log(2, {"loss": 1.2})
    log.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["loss"] == 1.5 and rows[0]["accuracy"] == 0.25
    assert rows[1]["step"] == 2
