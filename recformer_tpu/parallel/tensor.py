"""Tensor parallelism: Megatron-style parameter sharding over the 'model' axis.

The reference has no tensor parallelism (SURVEY §2.2 marks it "not required
for parity; optional megacore sharding of FFN/attention heads via pjit param
sharding"). This module is that option, TPU-native: no new step functions and
no hand-written collectives — parameters are *placed* with column-/row-
parallel ``PartitionSpec``s and GSPMD propagates the shardings through the
step, inserting the (two per layer) all-reduces after the attention output
projection and the FFN down projection.

Layout (kernels are ``(in, out)``; a leading layer-stack dim from
``scan_layers=True`` is handled by right-aligning the spec):

- column-parallel (output dim = heads / intermediate sharded):
  query/key/value/query_global/key_global/value_global, intermediate_dense —
  kernel ``P(..., None, 'model')``, bias ``P(..., 'model')``
- row-parallel (input dim sharded, output summed by psum):
  attention output_dense, ffn output_dense — kernel ``P(..., 'model', None)``,
  bias replicated (added once, after the psum)
- everything else (embeddings, LayerNorms, pooler, heads): replicated

Requirements: ``num_attention_heads`` and ``intermediate_size`` divisible by
the model-axis size; use an XLA attention impl (``chunked``/``dense``) — a
``pallas_call`` is an opaque custom call GSPMD cannot split over heads (the
Pallas kernel remains the single-chip/data-parallel fast path).

Use with the ``zero=True`` step factories (state shardings left unspecified,
so the committed placements here propagate). Optimizer-state leaves inherit
the param shardings for free: ``optax`` inits moments with ``zeros_like``,
which preserves committed shardings — i.e. TP + ZeRO-for-free on the moments.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# Dense/_ProjWeights module names -> parallel style
_COLUMN = frozenset({
    "query", "key", "value", "query_global", "key_global", "value_global",
    "intermediate_dense",
})
_ROW = frozenset({"output_dense"})


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:  # pragma: no cover - sequence keys don't appear in flax params
            names.append(str(k))
    return names


def tp_spec_for(path, leaf) -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    names = _path_names(path)
    if len(names) < 2:
        return P()
    owner, pname = names[-2], names[-1]
    ndim = getattr(leaf, "ndim", 0)
    if owner in _COLUMN:
        if pname == "kernel" and ndim >= 2:
            return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
        if pname == "bias" and ndim >= 1:
            return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    if owner in _ROW and pname == "kernel" and ndim >= 2:
        return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))
    return P()


def tp_param_specs(params):
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(tp_spec_for, params)


def shard_params_tp(params, mesh: Mesh):
    """Place ``params`` with TP shardings on ``mesh`` (model axis)."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def validate_tp_config(cfg, mesh: Mesh) -> None:
    n_model = mesh.shape[MODEL_AXIS]
    if n_model == 1:
        return
    if cfg.num_attention_heads % n_model:
        raise ValueError(
            f"num_attention_heads={cfg.num_attention_heads} not divisible by "
            f"model axis {n_model}")
    if cfg.intermediate_size % n_model:
        raise ValueError(
            f"intermediate_size={cfg.intermediate_size} not divisible by "
            f"model axis {n_model}")
    if cfg.attention_impl == "pallas":
        if cfg.attention_head_shard_axis != MODEL_AXIS:
            raise ValueError(
                "tensor parallelism with attention_impl='pallas' needs the "
                "kernel sharded over heads: use tp_config(cfg) (sets "
                "attention_head_shard_axis='model') and run under "
                "jax.set_mesh(mesh), or pick an XLA impl (chunked/dense)")
        lanes = (cfg.num_attention_heads // n_model) * cfg.head_dim
        if jax.default_backend() == "tpu" and lanes % 128:
            raise ValueError(
                f"per-shard head width {lanes} (= heads/model_axis * head_dim)"
                " must be a multiple of the 128-lane TPU tile; pick a model-"
                "axis size that keeps it aligned (e.g. 2/3/6 for 12x64 heads)")


def tp_config(cfg):
    """Config adjustments for tensor parallelism: the Pallas kernel runs
    head-sharded inside a shard_map over the 'model' axis (pallas_call is
    GSPMD-opaque; heads are independent inside the kernel). XLA impls need
    no change — GSPMD splits them from the param shardings alone."""
    if cfg.attention_impl == "pallas":
        return cfg.replace(attention_head_shard_axis=MODEL_AXIS)
    return cfg
