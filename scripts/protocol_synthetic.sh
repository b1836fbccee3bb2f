#!/usr/bin/env bash
# Leg-2 of the north-star fallback (docs/RESULTS.md): the full reference
# measurement protocol (/root/reference/finetune.py:298-353 semantics) at
# paper scale on the real TPU, on the structured synthetic corpus
# (recformer_tpu/pipelines/synthetic.py) because this box has no egress
# (docs/artifacts/download_attempt_round2.txt).
#
#   run A: two-stage finetune, random init        -> runs/ftA/finetune/test_metrics.json
#   run B: pretrain -> convert -> zero-shot -> two-stage finetune
#                                                 -> runs/ftB/finetune/test_metrics.json
#
# Production config throughout: pallas attention, scan_layers, selective
# remat (dots_attn). Logs under runs/. Idempotent per stage (skips stages
# whose outputs exist) so an interrupted chain resumes where it stopped.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs
PROD="--attention_impl pallas --scan_layers --remat --remat_policy dots_attn"

stamp() { echo "[protocol $(date +%H:%M:%S)] $*" | tee -a runs/protocol.log; }

# 0. corpus (paper scale: 5.3k/11k finetune, disjoint 8k/16k pretrain)
if [ ! -f runs/synth/stats.json ]; then
  stamp "generating paper-scale corpus"
  python -m recformer_tpu.pipelines.synthetic --out runs/synth --scale paper \
    2>&1 | tee runs/gen.log
fi

# A. two-stage finetune from random init (reference defaults: B=16, accum 8,
#    lr 5e-5, 16 epochs/stage, eval every 3, patience 5/3)
if [ ! -f runs/ftA/finetune/test_metrics.json ]; then
  stamp "run A: two-stage finetune, random init"
  RESUME=""; [ -f runs/ftA/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path runs/synth/finetune \
    --output_dir runs/ftA $PROD $RESUME 2>&1 | tee -a runs/ftA.log
fi
stamp "run A done: $(cat runs/ftA/finetune/test_metrics.json 2>/dev/null)"

# B1. pretrain on the DISJOINT item universe (canonical recipe; 8 epochs =
#     2k optimizer steps at eff. batch 64 — enough to measure transfer).
#     steps_per_call 16: the axon relay costs ~1.8s host dispatch per device
#     call (measured: 63.9 ex/s in-call vs ~23 ex/s wall at 8 steps/call).
if [ ! -f runs/pretrain/config.json ]; then
  stamp "run B: pretraining"
  PRESUME=""; [ -d runs/pretrain/state ] && PRESUME=--resume
  python -m recformer_tpu.cli.pretrain --data_path runs/synth/pretrain \
    --output_dir runs/pretrain $PROD --steps_per_call 16 $PRESUME \
    --num_train_epochs 8 --warmup_steps 200 --valid_step_interval 1000 \
    2>&1 | tee runs/pretrain.log
fi

# B2. convert (pretrain ckpt -> seqrec init)
if [ ! -d runs/converted/seqrec ]; then
  stamp "run B: converting checkpoint"
  python -m recformer_tpu.cli.convert_ckpt --pretrain_ckpt runs/pretrain/best \
    --config runs/pretrain/config.json --output_dir runs/converted \
    2>&1 | tee runs/convert.log
fi

# B3. zero-shot eval of the pretrained model on the finetune corpus
#     (the paper's text-transfer claim, /root/reference/evaluate_seq.py)
if [ ! -f runs/zeroshot.json ]; then
  stamp "run B: zero-shot eval"
  python -m recformer_tpu.cli.evaluate_seq --data_path runs/synth/finetune \
    --ckpt runs/converted/seqrec $PROD --output_file runs/zeroshot.json \
    2>&1 | tee runs/zeroshot.log
fi

# B4. two-stage finetune from the pretrained init
if [ ! -f runs/ftB/finetune/test_metrics.json ]; then
  stamp "run B: two-stage finetune from pretrain"
  RESUME=""; [ -f runs/ftB/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path runs/synth/finetune \
    --output_dir runs/ftB --pretrain_ckpt runs/converted/seqrec $PROD $RESUME \
    2>&1 | tee -a runs/ftB.log
fi
stamp "run B done: $(cat runs/ftB/finetune/test_metrics.json 2>/dev/null)"
stamp "ALL DONE"
