"""Numerical parity against the actual HF LongformerEncoder (the reference's
attention dependency, ``/root/reference/recformer/models.py:12-18``).

A randomly initialized torch ``LongformerEncoder`` is exported through the
torch->flax importer and the same inputs are pushed through both stacks in
fp32. This validates windowed-attention semantics, the global-token path, the
dedicated global projections, and the name mapping — end to end, offline.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from recformer_tpu.config import RecformerConfig
from recformer_tpu.models.encoder import LongformerEncoder as FlaxEncoder
from recformer_tpu.training.checkpoint import import_torch_state_dict

import jax
import jax.numpy as jnp


def make_hf_encoder(cfg: RecformerConfig):
    from transformers.models.longformer.modeling_longformer import (
        LongformerConfig,
        LongformerEncoder,
    )

    hf_cfg = LongformerConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        attention_window=list(cfg.attention_window),
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps,
    )
    enc = LongformerEncoder(hf_cfg)
    enc.eval()
    return enc


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_encoder_matches_hf_longformer(impl):
    cfg = RecformerConfig.tiny(
        dtype="float32", hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attention_impl=impl, max_token_num=64,
    )
    torch.manual_seed(0)
    hf_enc = make_hf_encoder(cfg)

    B, L, H = 2, 64, cfg.hidden_size
    hidden = torch.randn(B, L, H)
    # mask coding {0 pad, 1 local, 2 global} -> HF's merged float mask
    mask = np.ones((B, L), np.int32)
    mask[:, 0] = 2
    mask[1, -20:] = 0
    mask_f = torch.from_numpy((1.0 - mask.astype(np.float32)) * torch.finfo(torch.float32).min)

    with torch.no_grad():
        hf_out = hf_enc(
            hidden,
            attention_mask=mask_f,
            head_mask=None,
            padding_len=0,
            output_attentions=False,
            output_hidden_states=False,
            return_dict=True,
        ).last_hidden_state.numpy()

    # export HF weights -> our flax tree via the production importer
    sd = {f"longformer.encoder.{k}": v.numpy() for k, v in hf_enc.state_dict().items()}
    flax_enc = FlaxEncoder(cfg)
    params = flax_enc.init(jax.random.PRNGKey(0), jnp.asarray(hidden.numpy()),
                           jnp.asarray(mask))
    wrapped = {"params": {"longformer": {"encoder": params["params"]}}}
    merged, copied, skipped = import_torch_state_dict(sd, wrapped, verbose=False)
    assert len(copied) == len(sd), f"unmapped HF params: {skipped}"
    our_params = {"params": merged["params"]["longformer"]["encoder"]}

    ours = flax_enc.apply(our_params, jnp.asarray(hidden.numpy()), jnp.asarray(mask))
    ours = np.asarray(ours)

    # compare only at valid (non-pad) positions; HF writes garbage at pad rows
    valid = mask != 0
    np.testing.assert_allclose(ours[valid], hf_out[valid], rtol=2e-4, atol=2e-4)
