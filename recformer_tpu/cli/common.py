"""Shared driver plumbing: config construction, cached corpus tokenization,
item-table building, model/optimizer initialization.

Replaces the per-driver copy-pasted config override blocks of the reference
(``/root/reference/finetune.py:202-209`` and five clones — SURVEY §5.6) with
one canonical constructor, and the torch.save corpus caches
(``finetune.py:223-245``) with npz item tables.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import RecformerConfig
from ..utils.cache import enable_compilation_cache

enable_compilation_cache()
from ..data.item_table import ItemTable
from ..data.tokenization import RecformerTokenizer
from ..data.vocab import backend_for_config


def build_config(args, item_num: int = 0) -> RecformerConfig:
    kw = dict(item_num=item_num)
    for name in ("temp", "finetune_negative_sample_size", "attention_impl",
                 "max_token_num", "pooler_type", "mlm_weight", "pos_weight",
                 "scan_layers", "remat", "remat_policy", "hidden_act",
                 "scan_unroll", "ln_impl"):
        if hasattr(args, name) and getattr(args, name) is not None:
            kw[name] = getattr(args, name)
    if getattr(args, "model_size", "base") == "tiny":
        return RecformerConfig.tiny(**{k: v for k, v in kw.items()
                                       if k not in ("max_token_num",)})
    return RecformerConfig.base(**kw)


def make_tokenizer(config: RecformerConfig, hf_tokenizer_path: Optional[str] = None):
    hf_tok = None
    if hf_tokenizer_path:
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(hf_tokenizer_path, local_files_only=True)
    return RecformerTokenizer(config, backend_for_config(config, hf_tok))


def tokenize_corpus_cached(
    tokenizer: RecformerTokenizer,
    item_meta: Dict,
    item2id: Dict[str, int],
    cache_dir: str,
    cache_name: str,
) -> ItemTable:
    """Tokenize all item metadata into a packed ItemTable, with an npz disk
    cache (reference caches a torch pickle, ``finetune.py:223-245``)."""
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"item_table_{cache_name}.npz")
    if os.path.exists(cache):
        print(f"[corpus] cache hit: {cache}")
        return ItemTable.load(cache)
    print(f"[corpus] tokenizing {len(item_meta)} items")
    table = tokenizer.encode_corpus_table(item_meta, item2id)
    table.save(cache)
    return table


def table_to_device(table: ItemTable) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in table.as_arrays().items()}


def init_model_params(model, config: RecformerConfig, with_mlm: bool = False,
                      seq_len: Optional[int] = None, rng: int = 0):
    L = seq_len or config.max_token_num
    batch = {
        k: jnp.zeros((1, L), jnp.int32)
        for k in ("input_ids", "attention_mask", "global_attention_mask",
                  "token_type_ids", "item_position_ids")
    }
    from ..models.heads import RecformerForPretraining

    if isinstance(model, RecformerForPretraining):
        if with_mlm:
            batch["mlm_input_ids"] = batch["input_ids"]
            batch["mlm_positions"] = jnp.zeros((1, 8), jnp.int32)
        return model.init(jax.random.PRNGKey(rng), batch, batch)
    return model.init(jax.random.PRNGKey(rng), batch)


def maybe_load_pretrained(params, ckpt_path: Optional[str]):
    """Load a checkpoint into params: orbax dir or torch .bin (reference
    pretrain ckpts load with strict=False — ``finetune.py:269``)."""
    if not ckpt_path:
        return params
    from ..training import checkpoint as ckpt

    if os.path.isdir(ckpt_path):
        # partial-match merge = the reference's strict=False load
        source = ckpt.restore_params(ckpt_path)
        return ckpt.merge_params(source, params)
    sd = ckpt.load_torch_checkpoint(ckpt_path)
    params, _, _ = ckpt.import_torch_state_dict(sd, params)
    return params
