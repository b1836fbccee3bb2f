"""Checkpoint conversion driver: one pretrain checkpoint -> task-ready
checkpoints for the backbone, seq-rec, and fraud models.

Counterpart of ``/root/reference/convert_pretrain_ckpt.py`` (which strips
Lightning/DeepSpeed prefixes and emits three torch ckpts loaded with
``strict=False``): accepts either an orbax pretrain checkpoint or a reference
torch ``.bin`` (prefixes handled by the name mapper), and writes three orbax
checkpoints with every name+shape match transferred.

Optionally re-injects the word-embedding table from an original Longformer
checkpoint (``--longformer_ckpt``), mirroring ``convert_pretrain_ckpt.py:19``
(used with ``--fix_word_embedding`` training).
"""

from __future__ import annotations

import argparse
import os


from ..config import RecformerConfig
from ..models.heads import (
    RecformerForFraudDetection,
    RecformerForPretraining,
    RecformerForSeqRec,
)
from ..models.recformer import RecformerModel
from ..training import checkpoint as ckpt
from .common import init_model_params


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain_ckpt", type=str, required=True,
                   help="orbax dir or torch .bin")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--config", type=str, default=None, help="config.json path")
    p.add_argument("--model_size", choices=["base", "tiny"], default="base")
    p.add_argument("--longformer_ckpt", type=str, default=None,
                   help="optional HF Longformer .bin whose word embeddings "
                        "overwrite the trained ones")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.config:
        config = RecformerConfig.load(args.config)
    elif args.model_size == "tiny":
        config = RecformerConfig.tiny()
    else:
        config = RecformerConfig.base()

    # load the source pretrain params
    pre_model = RecformerForPretraining(config)
    pre_params = init_model_params(pre_model, config, with_mlm=True)
    if os.path.isdir(args.pretrain_ckpt):
        source = ckpt.restore_params(args.pretrain_ckpt)
        pre_params = ckpt.merge_params(source, pre_params)
    else:
        sd = ckpt.load_torch_checkpoint(args.pretrain_ckpt)
        pre_params, _, _ = ckpt.import_torch_state_dict(sd, pre_params)

    if args.longformer_ckpt:
        sd = ckpt.load_torch_checkpoint(args.longformer_ckpt)
        word_key = "longformer.embeddings.word_embeddings.weight"
        if word_key in sd:
            pre_params, _, _ = ckpt.import_torch_state_dict(
                {word_key: sd[word_key]}, pre_params
            )
            print("[convert] re-injected original Longformer word embeddings")

    os.makedirs(args.output_dir, exist_ok=True)
    targets = {
        "recformer": RecformerModel(config),
        "seqrec": RecformerForSeqRec(config),
        "fraud": RecformerForFraudDetection(config),
    }
    for name, model in targets.items():
        if name == "recformer":
            # backbone tree == the pretraining model's 'longformer' subtree
            params = {"params": pre_params["params"]["longformer"]}
        else:
            params = init_model_params(model, config)
            params = ckpt.merge_params(pre_params, params)
        out = os.path.join(args.output_dir, name)
        ckpt.save_params(out, params)
        print(f"[convert] wrote {out}")
    config.save(os.path.join(args.output_dir, "config.json"))


if __name__ == "__main__":
    main()
