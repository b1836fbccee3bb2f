"""Device mesh construction and sharding helpers.

The reference's distribution stack is NCCL through three doors (DeepSpeed
ZeRO-2, ``torch.distributed.all_gather``, ``nn.DataParallel`` — SURVEY §2.2).
TPU-native, there is exactly one abstraction: a ``jax.sharding.Mesh`` with a
``data`` axis (data parallelism: batch sharding, gradient psum — replaces
DeepSpeed/DDP) and a ``model`` axis (row-sharded item catalog + scoring —
replaces the reference's single-device full-catalog softmax,
``models.py:541-545``). Collectives are inserted by GSPMD from sharding
annotations, or written explicitly in ``shard_map`` where the communication
pattern must be guaranteed (``catalog.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('data', 'model'). Default: all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """First (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharded(mesh: Mesh) -> NamedSharding:
    """First dim split over the model axis (item catalog rows)."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in a host batch with its batch dim sharded on
    'data'. Batch size must be divisible by the data-axis size."""
    sh = data_sharded(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def shard_optimizer_state(state, mesh: Mesh):
    """ZeRO-1-style optimizer-state sharding: every large optimizer-state
    leaf whose leading dim divides the data-axis size is sharded over 'data';
    params stay replicated. This is the TPU-native analog of DeepSpeed
    ZeRO's optimizer partitioning (reference:
    ``lightning_pretrain.py:143``) — GSPMD inserts the gather/scatter around
    the AdamW update automatically.

    Use together with step factories built with ``zero=True`` (their state
    in/out shardings are left unspecified so the committed shardings here
    propagate)."""
    n = mesh.shape[DATA_AXIS]
    rep = replicated(mesh)

    def place(leaf):
        leaf = jnp.asarray(leaf) if not hasattr(leaf, "sharding") else leaf
        if (getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] % n == 0
                and leaf.size >= 1024):
            return jax.device_put(leaf, NamedSharding(mesh, P(DATA_AXIS)))
        return jax.device_put(leaf, rep)

    new_opt = jax.tree.map(place, state.opt_state)
    new_params = jax.device_put(state.params, rep)
    return state.replace(params=new_params, opt_state=new_opt)


def pad_rows_to_multiple(x: np.ndarray, multiple: int, fill=0):
    """Pad dim-0 so it divides evenly across a mesh axis; returns (padded,
    original_len)."""
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad_width, constant_values=fill), n
