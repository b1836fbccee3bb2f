"""Single-source-of-truth configuration for the TPU-native Recformer framework.

The reference scatters configuration across an HF ``LongformerConfig`` subclass
(``/root/reference/recformer/models.py:24-55``) plus hard-coded per-driver
overrides repeated in six places (e.g. ``/root/reference/finetune.py:202-209``).
Here there is exactly one typed, frozen dataclass; the canonical training recipe
is a constructor, not a copy-pasted override block.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class RecformerConfig:
    """Model + data-contract hyperparameters.

    Field semantics follow the reference (``recformer/models.py:24-55``):

    - ``token_type_size=4``: token types are 0=<s>, 1=attribute key,
      2=attribute value, 3=<pad>.
    - ``max_item_embeddings``: max items per sequence + 1 (item position 0 is
      reserved for the <s> token; padding uses ``max_item_embeddings - 1``).
    - ``max_token_num``: hard cap on tokens per sequence. On TPU this is also
      the *static* padded length of every sequence-tower batch.
    """

    # --- text/backbone (longformer-base-4096 geometry) ---
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    # 'gelu' = exact erf GELU (HF Longformer's hidden_act, the parity
    # default); 'gelu_tanh' = tanh approximation — measured numerically
    # indistinguishable at bf16 but ~free on the TPU VPU where XLA's erf
    # costs +124% on the fused FFN-up GEMM (docs/PERF.md epilogue bench);
    # 'relu' for completeness.
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 4098
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02

    # --- special token ids (RoBERTa/Longformer conventions) ---
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    sep_token_id: int = 2
    mask_token_id: int = 50264

    # --- attention ---
    # One window per layer; each token attends to window/2 tokens on each side.
    attention_window: Tuple[int, ...] = (64,) * 12
    # 'dense' = full masked attention (numerics oracle),
    # 'chunked' = XLA sliding-chunks banded attention,
    # 'pallas' = fused Pallas windowed+global kernel,
    # 'sequence_parallel' = context-parallel halo attention; the forward must
    #   run inside shard_map with dim 1 sharded over `sequence_axis`
    #   (see parallel/sequence.make_sequence_parallel_forward).
    attention_impl: str = "chunked"
    sequence_axis: str = "seq"
    # Tensor parallelism + the Pallas kernel: a pallas_call is an opaque
    # custom call GSPMD cannot split, but heads are embarrassingly parallel
    # inside it. When set (to the mesh axis name the attention-head dim is
    # sharded over, normally 'model'), the kernel is invoked inside a
    # shard_map over that axis so each shard runs the fused kernel on its
    # local heads. Requires an ambient mesh (jax.set_mesh) at trace time.
    attention_head_shard_axis: str | None = None
    # 'xla' = let XLA fuse the 4-embedding sum + LayerNorm,
    # 'pallas' = fused Pallas sum+LN kernel (one VMEM pass, custom VJP).
    embed_ln_impl: str = "xla"
    # "xla": nn.LayerNorm everywhere; "pallas_bwd": jnp forward (still
    # XLA-fused into the producing GEMM) + fused Pallas backward kernel for
    # the encoder-block LayerNorms (profile: the XLA LN-backward epilogue
    # quadruples the attached GEMM's time — docs/PERF.md); "split_bwd":
    # jnp forward + jnp backward with an optimization_barrier cutting only
    # the cross-row dgamma/dbeta reductions out of the dW-GEMM fusion (the
    # dx chain stays fusable — per-row lane reductions)
    ln_impl: str = "xla"
    # How the key_global/value_global projections are applied. The global
    # query rows (<= 1 per sequence) are the ONLY consumers of those two
    # full-length (L, hs, hs) GEMMs per layer. 'thin' reassociates
    # x @ (W_kg q_g) instead of (x @ W_kg) q_g, turning both projections
    # (and their backward) into N=heads-wide thin GEMMs — same math, ~64x
    # fewer FLOPs. 'full' materializes k_g/v_g like the reference's HF
    # Longformer (and is required by attention_impl='sequence_parallel',
    # which shards the full-length tensors).
    global_kv_mode: str = "thin"

    # --- rec-specific data contract ---
    token_type_size: int = 4
    max_token_num: int = 1024
    max_item_embeddings: int = 51
    max_attr_num: int = 3
    max_attr_length: int = 32

    # --- heads / losses ---
    pooler_type: str = "cls"  # 'cls' | 'avg'
    temp: float = 0.05
    mlm_weight: float = 0.1
    mlm_probability: float = 0.15
    item_num: int = 0
    finetune_negative_sample_size: int = 0
    pos_weight: float = 1.0  # fraud BCE positive-class weight

    # --- TPU execution ---
    dtype: str = "bfloat16"  # compute dtype
    param_dtype: str = "float32"
    # Static padded length of the single-item tower in pretraining / item
    # encoding. The reference pads item views to the same dynamic length as
    # sequence views; on TPU we give the item tower its own short static shape.
    # Must be a multiple of the attention window and >= the max item token
    # count (1 + max_attr_num * max_attr_length).
    item_seq_len: int = 128
    # Run each pretraining view's clean + MLM-corrupted passes as one (2B, L)
    # batched forward (better MXU utilization) instead of two sequential
    # passes. Costs ~2x transient activation memory; disable when HBM-bound.
    fuse_mlm_pass: bool = True
    # Stack the (identical-window) encoder layers and iterate them with
    # jax.lax.scan: ~num_layers x smaller XLA program => much faster compiles,
    # same math. Parameters become (num_layers, ...) stacked leaves (the
    # checkpoint importer handles both layouts). Requires all attention
    # windows equal.
    scan_layers: bool = False
    # Rematerialize each encoder layer in backward (jax.checkpoint): trades
    # ~30% more FLOPs for O(num_layers) less activation memory. Worth it for
    # big batches / long sequences.
    remat: bool = False
    # What the layer remat saves (only meaningful with remat=True):
    #   'full'           — save nothing, recompute the whole layer (classic).
    #   'save_attention' — save the self-attention output (checkpoint_name
    #     'attn_out'); backward then recomputes only the q/k/v/FFN GEMMs.
    #     The fused attention kernel's backward needs just its *inputs* as
    #     residuals (ops/pallas_attention.py::_band_core_fwd), so saving its
    #     output lets XLA dead-code the fwd kernel out of the recompute —
    #     the single most expensive op in the layer never runs twice.
    #   'dots'           — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    #     (save every non-batch matmul output; the attention kernel still
    #     recomputes — it is a pallas_call, not a dot).
    #   'dots_attn'      — both of the above: backward recomputes only
    #     elementwise ops. Most memory, least recompute.
    remat_policy: str = "full"
    # lax.scan unroll factor for the scanned encoder (scan_layers=True): >1
    # re-exposes cross-layer fusion to XLA at k x the program size. Measured
    # on v5e (docs/PERF.md): a wash at the 12-layer depth — kept at 1.
    scan_unroll: int = 1
    # Reference parity: the reference's contrastive loss only backprops through
    # the local shard of gathered embeddings (models.py:475-490). JAX's
    # all_gather is natively differentiable; 'full' uses that (better
    # gradients), 'local' reproduces the reference's stop-gradient-on-remotes.
    contrastive_gradient: str = "full"

    # ------------------------------------------------------------------
    def __post_init__(self):
        if isinstance(self.attention_window, int):
            object.__setattr__(
                self,
                "attention_window",
                (self.attention_window,) * self.num_hidden_layers,
            )
        else:
            object.__setattr__(self, "attention_window", tuple(self.attention_window))
        if len(self.attention_window) != self.num_hidden_layers:
            raise ValueError(
                f"len(attention_window)={len(self.attention_window)} must equal "
                f"num_hidden_layers={self.num_hidden_layers}"
            )
        for w in self.attention_window:
            if w <= 0 or w % 2:
                raise ValueError(f"attention_window entries must be positive and even, got {w}")
        if self.max_token_num % max(self.attention_window):
            raise ValueError(
                "max_token_num must be a multiple of the largest attention window "
                f"({self.max_token_num} % {max(self.attention_window)} != 0)"
            )
        if self.item_seq_len % max(self.attention_window):
            raise ValueError("item_seq_len must be a multiple of the largest attention window")
        if self.hidden_size % self.num_attention_heads:
            raise ValueError("hidden_size must be divisible by num_attention_heads")
        # padding-aware position ids run up to max_token_num + pad_token_id + 1
        if self.max_token_num + self.pad_token_id + 1 > self.max_position_embeddings:
            raise ValueError(
                f"max_token_num={self.max_token_num} needs at least "
                f"{self.max_token_num + self.pad_token_id + 1} position embeddings, "
                f"got {self.max_position_embeddings}"
            )
        if self.hidden_act not in ("gelu", "gelu_tanh", "relu"):
            raise ValueError(f"unknown hidden_act {self.hidden_act!r}")
        if self.remat_policy not in ("full", "save_attention", "dots", "dots_attn"):
            raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
        if self.scan_unroll < 1 or (self.scan_layers and
                                    self.num_hidden_layers % self.scan_unroll):
            raise ValueError("scan_unroll must be >=1 and divide num_hidden_layers")
        if self.pooler_type not in ("cls", "avg"):
            raise ValueError(f"unknown pooler_type {self.pooler_type!r}")
        if self.attention_impl not in ("dense", "chunked", "pallas",
                                       "sequence_parallel"):
            raise ValueError(f"unknown attention_impl {self.attention_impl!r}")
        if self.embed_ln_impl not in ("xla", "pallas"):
            raise ValueError(f"unknown embed_ln_impl {self.embed_ln_impl!r}")
        if self.ln_impl not in ("xla", "pallas_bwd", "split_bwd"):
            raise ValueError(f"unknown ln_impl {self.ln_impl!r}")
        if self.global_kv_mode not in ("thin", "full"):
            raise ValueError(f"unknown global_kv_mode {self.global_kv_mode!r}")
        if self.scan_layers and len(set(self.attention_window)) != 1:
            raise ValueError("scan_layers requires all attention windows equal")
        if self.contrastive_gradient not in ("full", "local"):
            raise ValueError(f"unknown contrastive_gradient {self.contrastive_gradient!r}")

    # ------------------------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def max_item_token_len(self) -> int:
        """Max tokens a single encoded item can contribute."""
        return self.max_attr_num * self.max_attr_length

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def params_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "RecformerConfig":
        return dataclasses.replace(self, **kw)

    # --- canonical recipes -------------------------------------------
    @classmethod
    def base(cls, **kw) -> "RecformerConfig":
        """The canonical recipe used by every reference driver
        (``/root/reference/finetune.py:202-209``): longformer-base backbone,
        window 64, 1024 tokens, 51 item positions, 3x32 attributes.

        Defaults to the fused Pallas attention kernel (measured ~20% faster
        end-to-end than the XLA sliding-chunks path on v5e); pass
        ``attention_impl='chunked'`` to run this config on CPU. Also defaults
        to the tanh GELU approximation — XLA's exact erf more than doubles
        the fused FFN-up GEMM time on v5e while tanh is ~free (docs/PERF.md);
        pass ``hidden_act='gelu'`` for bitwise HF-activation parity."""
        kw.setdefault("attention_impl", "pallas")
        kw.setdefault("hidden_act", "gelu_tanh")
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "RecformerConfig":
        """Small config for tests and CI: 2 layers, hidden 64, window 16."""
        defaults = dict(
            vocab_size=1024,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=520,
            attention_window=(16, 16),
            max_token_num=256,
            max_item_embeddings=11,
            max_attr_num=3,
            max_attr_length=8,
            item_seq_len=32,
            mask_token_id=1023,
        )
        defaults.update(kw)
        return cls(**defaults)

    # --- (de)serialization -------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "RecformerConfig":
        raw = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "RecformerConfig":
        with open(path) as f:
            return cls.from_json(f.read())
