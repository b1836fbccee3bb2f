"""Checkpointing: orbax save/restore + torch/HF Longformer weight import.

Replaces the reference's three-script checkpoint surgery chain
(``/root/reference/save_longformer_ckpt.py`` -> DeepSpeed zero merge ->
``convert_pretrain_ckpt.py``) with:

- :func:`save_params` / :func:`restore_params` — orbax, any pytree;
- :func:`import_torch_state_dict` — one name-mapped converter that accepts
  either a raw HF ``LongformerForMaskedLM`` state dict or a reference
  Recformer checkpoint, copies every name+shape match into a flax param tree,
  and (like ``save_longformer_ckpt.py:15-29``) leaves non-matching params —
  e.g. the 4-row token-type table vs HF's 1-row, and the new item-position
  embeddings — at their fresh initialization, reporting what was skipped.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax
# ---------------------------------------------------------------------------

def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, params), force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree.map(np.asarray, template)
        return ckptr.restore(path, template)
    return ckptr.restore(path)


# ---------------------------------------------------------------------------
# Torch -> flax name mapping
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    root: dict = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


def _torch_name_to_flax_path(name: str) -> Tuple[Tuple[str, ...], bool]:
    """Map a torch Longformer/Recformer parameter name to our flax tree path.
    Returns (path, transpose) where transpose applies to Dense kernels.
    Raises KeyError for names with no counterpart (position_ids buffers...)."""
    n = name
    # strip Lightning/DeepSpeed wrapper prefixes (convert_pretrain_ckpt.py:25-30)
    n = re.sub(r"^_forward_module\.", "", n)
    n = re.sub(r"^model\.", "", n)

    emb = {
        "word_embeddings.weight": ("embeddings", "word_embeddings", "embedding"),
        "position_embeddings.weight": ("embeddings", "position_embeddings", "embedding"),
        "token_type_embeddings.weight": ("embeddings", "token_type_embeddings", "embedding"),
        "item_position_embeddings.weight": ("embeddings", "item_position_embeddings", "embedding"),
        "LayerNorm.weight": ("embeddings", "LayerNorm", "scale"),
        "LayerNorm.bias": ("embeddings", "LayerNorm", "bias"),
    }
    m = re.match(r"^longformer\.embeddings\.(.+)$", n)
    if m and m.group(1) in emb:
        return ("longformer",) + emb[m.group(1)], False

    m = re.match(
        r"^longformer\.encoder\.layer\.(\d+)\.(.+)$", n
    )
    if m:
        i, rest = int(m.group(1)), m.group(2)
        layer = ("longformer", "encoder", f"layer_{i}")
        attn_proj = re.match(
            r"attention\.self\.(query|key|value|query_global|key_global|value_global)\.(weight|bias)$",
            rest,
        )
        if attn_proj:
            proj, wb = attn_proj.groups()
            leaf = ("kernel", True) if wb == "weight" else ("bias", False)
            return layer + ("attention", "self", proj, leaf[0]), leaf[1]
        table = {
            "attention.output.dense.weight": (("attention", "output_dense", "kernel"), True),
            "attention.output.dense.bias": (("attention", "output_dense", "bias"), False),
            "attention.output.LayerNorm.weight": (("attention", "output_LayerNorm", "scale"), False),
            "attention.output.LayerNorm.bias": (("attention", "output_LayerNorm", "bias"), False),
            "intermediate.dense.weight": (("ffn", "intermediate_dense", "kernel"), True),
            "intermediate.dense.bias": (("ffn", "intermediate_dense", "bias"), False),
            "output.dense.weight": (("ffn", "output_dense", "kernel"), True),
            "output.dense.bias": (("ffn", "output_dense", "bias"), False),
            "output.LayerNorm.weight": (("ffn", "output_LayerNorm", "scale"), False),
            "output.LayerNorm.bias": (("ffn", "output_LayerNorm", "bias"), False),
        }
        if rest in table:
            path, tr = table[rest]
            return layer + path, tr
        raise KeyError(name)

    lm = {
        "lm_head.dense.weight": (("lm_head", "dense", "kernel"), True),
        "lm_head.dense.bias": (("lm_head", "dense", "bias"), False),
        "lm_head.layer_norm.weight": (("lm_head", "layer_norm", "scale"), False),
        "lm_head.layer_norm.bias": (("lm_head", "layer_norm", "bias"), False),
        "lm_head.bias": (("lm_head", "bias"), False),
    }
    if n in lm:
        path, tr = lm[n]
        return path, tr
    raise KeyError(name)


def import_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    params,
    strict: bool = False,
    verbose: bool = True,
) -> Tuple[dict, List[str], List[str]]:
    """Copy every name+shape-matching tensor from a torch state dict into a
    flax param tree (``{'params': ...}`` or bare). Returns
    (new_params, copied_names, skipped_names)."""
    bare = "params" not in params
    tree = params if bare else params["params"]
    tree = jax.tree.map(np.asarray, tree)
    restack = _template_is_stacked(tree)
    if restack:
        # import into the unrolled view, restack at the end (scan_layers)
        tree = unstack_layer_params(tree)
    flat = _flatten(tree)
    copied, skipped = [], []
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor)
        try:
            path, transpose = _torch_name_to_flax_path(name)
        except KeyError:
            skipped.append(name)
            continue
        if path not in flat:
            skipped.append(name)
            continue
        if transpose:
            arr = arr.T
        if flat[path].shape != arr.shape:
            skipped.append(f"{name} (shape {arr.shape} vs {flat[path].shape})")
            continue
        flat[path] = arr.astype(flat[path].dtype)
        copied.append(name)
    if verbose:
        print(f"[import] copied {len(copied)} tensors, skipped {len(skipped)}")
        for s in skipped[:20]:
            print(f"[import]   skipped: {s}")
    if strict and skipped:
        raise ValueError(f"strict import: skipped {skipped}")
    new_tree = _unflatten(flat)
    if restack:
        new_tree = stack_layer_params(new_tree)
    return (new_tree if bare else {**params, "params": new_tree}), copied, skipped


def _is_unrolled_layer_dict(d) -> bool:
    return (
        isinstance(d, dict)
        and "layer_0" in d
        and all(re.fullmatch(r"layer_\d+", k) for k in d)
    )


def _is_stacked_layer_dict(d) -> bool:
    return isinstance(d, dict) and set(d) == {"layer"} and isinstance(d["layer"], dict)


def stack_layer_params(tree):
    """Convert unrolled encoder layers (``layer_0..layer_{n-1}`` siblings)
    into the ``scan_layers`` layout (``layers/layer`` with a leading
    (num_layers,) axis on every leaf). Walks the whole tree."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "encoder" and isinstance(v, dict) and _is_unrolled_layer_dict(v):
            n = len(v)
            layers = [stack_layer_params(v[f"layer_{i}"]) for i in range(n)]
            stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *layers)
            out[k] = {"layers": {"layer": stacked}}
        else:
            out[k] = stack_layer_params(v)
    return out


def unstack_layer_params(tree):
    """Inverse of :func:`stack_layer_params`."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if (k == "encoder" and isinstance(v, dict) and "layers" in v
                and _is_stacked_layer_dict(v["layers"])):
            stacked = v["layers"]["layer"]
            n = jax.tree.leaves(stacked)[0].shape[0]
            out[k] = {
                f"layer_{i}": jax.tree.map(lambda x: np.asarray(x)[i], stacked)
                for i in range(n)
            }
        else:
            out[k] = unstack_layer_params(v)
    return out


def _template_is_stacked(tree) -> bool:
    flat = _flatten(tree)
    return any("layers" in path for path in flat)


def merge_params(source, template, verbose: bool = True):
    """Flax-side ``strict=False`` load: copy every path+shape match from
    ``source`` into ``template`` (both ``{'params': ...}`` or bare trees),
    leaving everything else at the template's values — the analog of the
    reference's head-mismatched ``load_state_dict(..., strict=False)``
    (``/root/reference/finetune.py:269``). Returns the merged tree."""
    src = source.get("params", source) if isinstance(source, dict) else source
    bare = "params" not in template
    tmpl = template if bare else template["params"]
    # auto-convert between unrolled and scan_layers (stacked) layer layouts
    src_np = jax.tree.map(np.asarray, src)
    if _template_is_stacked(tmpl) and not _template_is_stacked(src_np):
        src_np = stack_layer_params(src_np)
    elif not _template_is_stacked(tmpl) and _template_is_stacked(src_np):
        src_np = unstack_layer_params(src_np)
    src = src_np
    flat_src = _flatten(jax.tree.map(np.asarray, src))
    flat_tmpl = _flatten(jax.tree.map(np.asarray, tmpl))
    copied = skipped = 0
    for path, arr in flat_src.items():
        if path in flat_tmpl and flat_tmpl[path].shape == arr.shape:
            flat_tmpl[path] = arr.astype(flat_tmpl[path].dtype)
            copied += 1
        else:
            skipped += 1
    if verbose:
        print(f"[merge] copied {copied} params, skipped {skipped}")
    merged = _unflatten(flat_tmpl)
    return merged if bare else {**template, "params": merged}


def save_train_state(path: str, state) -> None:
    """Persist params + optimizer state + step for exact resume."""
    import orbax.checkpoint as ocp

    payload = {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": np.asarray(state.step),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, state):
    """Restore a TrainState previously saved with :func:`save_train_state`."""
    import orbax.checkpoint as ocp

    template = {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "step": np.asarray(state.step),
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path), template)
    return state.replace(
        params=payload["params"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state), jax.tree.leaves(payload["opt_state"])
        ),
        step=int(payload["step"]),
    )


class TopKCheckpointManager:
    """Keep the k best checkpoints by a monitored metric (reference:
    Lightning ``ModelCheckpoint(save_top_k=5, monitor='accuracy', mode='max')``
    at ``lightning_pretrain.py:127-132``). Checkpoints are orbax dirs named
    ``step{N}_m{metric:.6f}``; the worst is pruned when over capacity."""

    def __init__(self, root: str, k: int = 5, mode: str = "max"):
        assert mode in ("max", "min")
        self.root = root
        self.k = k
        self.mode = mode
        os.makedirs(root, exist_ok=True)
        self._entries: List[Tuple[float, str]] = []
        for name in os.listdir(root):
            m = re.fullmatch(r"step\d+_m(-?[\d.]+)", name)
            if m:
                self._entries.append((float(m.group(1)), os.path.join(root, name)))

    def _worse(self, a: float, b: float) -> bool:
        return a < b if self.mode == "max" else a > b

    def save(self, params, step: int, metric: float) -> Optional[str]:
        """Save if the metric makes the top-k; returns the path or None."""
        if len(self._entries) >= self.k:
            worst = min(self._entries, key=lambda e: e[0] if self.mode == "max" else -e[0])
            if self._worse(metric, worst[0]):
                return None
        path = os.path.join(self.root, f"step{step}_m{metric:.6f}")
        save_params(path, params)
        self._entries.append((metric, path))
        while len(self._entries) > self.k:
            worst = min(self._entries, key=lambda e: e[0] if self.mode == "max" else -e[0])
            self._entries.remove(worst)
            import shutil

            shutil.rmtree(worst[1], ignore_errors=True)
        return path

    def best_path(self) -> Optional[str]:
        if not self._entries:
            return None
        best = max(self._entries, key=lambda e: e[0] if self.mode == "max" else -e[0])
        return best[1]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.bin`` checkpoint to numpy on CPU (no CUDA)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
