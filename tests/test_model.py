"""Model forward-pass tests: shapes, pooling, mask semantics, head outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recformer_tpu.config import RecformerConfig
from recformer_tpu.data.tokenization import RecformerTokenizer
from recformer_tpu.data.vocab import SimpleVocab
from recformer_tpu.models.heads import (
    RecformerForFraudDetection,
    RecformerForPretraining,
    RecformerForSeqRec,
    similarity_scores,
)
from recformer_tpu.models.recformer import RecformerModel


@pytest.fixture(scope="module")
def cfg():
    return RecformerConfig.tiny(attention_impl="chunked", hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def batch(cfg):
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    seqs = [
        [{"brand": f"brand{i}", "color": "blue green"} for i in range(6)],
        [{"brand": "solo", "size": "tiny"}],
    ]
    arrs = tok.batch_encode(seqs, pad_to_max=True)
    return {k: jnp.asarray(v) for k, v in arrs.items() if k != "word_begin"}


def test_backbone_shapes_and_pooling(cfg, batch):
    model = RecformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)
    hidden, pooled = model.apply(params, **batch)
    B, L = batch["input_ids"].shape
    assert hidden.shape == (B, L, cfg.hidden_size)
    assert pooled.shape == (B, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[:, 0]), rtol=1e-6)


def test_padding_invariance(cfg, batch):
    """Changing token ids at padded positions must not change pooled output."""
    model = RecformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)
    _, pooled1 = model.apply(params, **batch)
    pad = batch["attention_mask"] == 0
    corrupted = dict(batch)
    # keep ids within vocab but different content at padded slots
    corrupted["input_ids"] = jnp.where(pad, 7, batch["input_ids"])
    _, pooled2 = model.apply(params, **corrupted)
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled2), rtol=2e-4, atol=2e-4)


def test_dense_and_chunked_backbones_agree(cfg, batch):
    m_dense = RecformerModel(cfg.replace(attention_impl="dense"))
    m_chunk = RecformerModel(cfg.replace(attention_impl="chunked"))
    params = m_dense.init(jax.random.PRNGKey(0), **batch)
    h1, p1 = m_dense.apply(params, **batch)
    h2, p2 = m_chunk.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=5e-3, atol=5e-3)


def test_avg_pooler(cfg, batch):
    model = RecformerModel(cfg.replace(pooler_type="avg"))
    params = model.init(jax.random.PRNGKey(0), **batch)
    hidden, pooled = model.apply(params, **batch)
    # reference quirk: weights are the merged mask (CLS counts twice)
    w = np.asarray(batch["attention_mask"] * (batch["global_attention_mask"] + 1))
    h = np.asarray(hidden)
    expect = (h * w[:, :, None]).sum(1) / w.sum(-1, keepdims=True)
    # pooled is computed in bf16; compare with bf16-level tolerance
    np.testing.assert_allclose(np.asarray(pooled), expect, rtol=2e-2, atol=2e-2)


def test_seqrec_head_and_scoring(cfg, batch):
    model = RecformerForSeqRec(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    pooled = model.apply(params, batch)
    N, H = 13, cfg.hidden_size
    table = jax.random.normal(jax.random.PRNGKey(1), (N, H))
    scores = similarity_scores(pooled, table, cfg.temp)
    assert scores.shape == (2, N)
    # cosine/temp bounds
    assert np.all(np.abs(np.asarray(scores)) <= 1.0 / cfg.temp + 1e-4)
    # candidate-subset scoring consistent with full-catalog scoring
    cands = jnp.asarray([[0, 5, 7], [1, 2, 3]])
    sub = similarity_scores(pooled, table[cands], cfg.temp)
    full = np.asarray(scores)
    np.testing.assert_allclose(
        np.asarray(sub), np.take_along_axis(full, np.asarray(cands), 1), rtol=1e-5
    )


def test_fraud_head(cfg, batch):
    model = RecformerForFraudDetection(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    logits = model.apply(params, batch)
    assert logits.shape == (2,)
    assert np.isfinite(np.asarray(logits)).all()


def test_pretraining_forward(cfg, batch):
    model = RecformerForPretraining(cfg)
    B, L = batch["input_ids"].shape
    P = 8
    batch_a = dict(batch)
    batch_a["mlm_input_ids"] = batch["input_ids"]
    batch_a["mlm_positions"] = jnp.tile(jnp.arange(P)[None], (B, 1))
    batch_b = dict(batch)
    params = model.init(jax.random.PRNGKey(0), batch_a, batch_b)
    out = model.apply(params, batch_a, batch_b)
    assert out.z1.shape == (B, cfg.hidden_size)
    assert out.z2.shape == (B, cfg.hidden_size)
    assert out.mlm_logits_a.shape == (B, P, cfg.vocab_size)
    assert out.mlm_logits_b is None


def test_scan_layers_matches_unrolled(cfg, batch):
    """scan_layers=True produces identical outputs given restacked params."""
    from recformer_tpu.training.checkpoint import stack_layer_params

    cfg32 = cfg.replace(dtype="float32")
    unrolled = RecformerModel(cfg32)
    params = unrolled.init(jax.random.PRNGKey(0), **batch)
    h1, p1 = unrolled.apply(params, **batch)

    scanned = RecformerModel(cfg32.replace(scan_layers=True))
    s_params = {"params": stack_layer_params(params["params"])}
    h2, p2 = scanned.apply(s_params, **batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)


def test_scan_layers_init_shapes(cfg):
    cfgs = cfg.replace(scan_layers=True)
    model = RecformerModel(cfgs)
    b = {
        k: jnp.zeros((1, cfgs.max_token_num), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    params = model.init(jax.random.PRNGKey(0), **b)
    layer = params["params"]["encoder"]["layers"]["layer"]
    q = layer["attention"]["self"]["query"]["kernel"]
    assert q.shape == (cfgs.num_hidden_layers, cfgs.hidden_size, cfgs.hidden_size)


def test_stack_unstack_roundtrip(cfg, batch):
    from recformer_tpu.training.checkpoint import (
        _flatten,
        stack_layer_params,
        unstack_layer_params,
    )

    model = RecformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)
    rt = unstack_layer_params(stack_layer_params(params["params"]))
    a = _flatten(jax.tree.map(np.asarray, params["params"]))
    b = _flatten(jax.tree.map(np.asarray, rt))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_full_4096_context_config():
    """North-star config #5: full 4096-token context compiles and runs
    (backbone positions top out at 4098 like the reference's Longformer)."""
    cfg = RecformerConfig.tiny(
        max_token_num=4096, max_item_embeddings=200, item_seq_len=32,
        attention_window=(16, 16), hidden_dropout_prob=0.0,
        max_position_embeddings=4100,
    )
    model = RecformerModel(cfg)
    b = {
        k: jnp.zeros((1, 4096), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    b["attention_mask"] = b["attention_mask"].at[:, :4096].set(1)
    b["global_attention_mask"] = b["global_attention_mask"].at[:, 0].set(1)
    params = model.init(jax.random.PRNGKey(0), **b)
    hidden, pooled = model.apply(params, **b)
    assert hidden.shape == (1, 4096, cfg.hidden_size)
    assert np.isfinite(np.asarray(pooled)).all()


def test_attention_probs_dropout_active_in_training(cfg, batch):
    """attention_probs_dropout_prob is applied in train mode (HF Longformer
    drops post-softmax attention probabilities) and off in eval mode."""
    drop_cfg = cfg.replace(attention_probs_dropout_prob=0.5)
    model = RecformerModel(drop_cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)

    _, eval_pooled = model.apply(params, **batch, deterministic=True)
    _, t1 = model.apply(params, **batch, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    _, t2 = model.apply(params, **batch, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    _, t3 = model.apply(params, **batch, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})

    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(t1), np.asarray(t3))
    assert not np.allclose(np.asarray(t1), np.asarray(eval_pooled))
    # eval mode is unaffected by the dropout config
    base = RecformerModel(cfg)
    _, eval_base = base.apply(params, **batch, deterministic=True)
    np.testing.assert_array_equal(np.asarray(eval_pooled), np.asarray(eval_base))


def test_hidden_act_tanh_gelu_close_to_exact(cfg, batch):
    """base() defaults to the tanh GELU approximation (docs/PERF.md: XLA's
    exact erf costs +124% on the fused FFN-up GEMM); outputs must stay within
    bf16-level tolerance of the exact activation on the same params."""
    model_exact = RecformerModel(cfg)
    params = model_exact.init(jax.random.PRNGKey(0), **batch)
    _, pooled_exact = model_exact.apply(params, **batch)
    model_tanh = RecformerModel(cfg.replace(hidden_act="gelu_tanh"))
    _, pooled_tanh = model_tanh.apply(params, **batch)
    np.testing.assert_allclose(np.asarray(pooled_exact, np.float32),
                               np.asarray(pooled_tanh, np.float32),
                               atol=5e-3, rtol=5e-3)
    assert RecformerConfig.base().hidden_act == "gelu_tanh"
    assert RecformerConfig.base(hidden_act="gelu").hidden_act == "gelu"
    assert RecformerConfig.tiny().hidden_act == "gelu"  # parity default
    with pytest.raises(ValueError):
        RecformerConfig.tiny(hidden_act="swish")
