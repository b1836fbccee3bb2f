#!/usr/bin/env bash
# Leg-2 of the north-star fallback (docs/RESULTS.md): the full reference
# measurement protocol (/root/reference/finetune.py:298-353 semantics) on the
# real TPU, on the structured synthetic corpus
# (recformer_tpu/pipelines/synthetic.py) because this box has no egress
# (docs/artifacts/download_attempt_round2.txt).
#
#   run A: two-stage finetune, random init        -> $DIR/ftA/finetune/test_metrics.json
#   run B: pretrain -> convert -> zero-shot -> two-stage finetune
#                                                 -> $DIR/ftB/finetune/test_metrics.json
#
# Production config throughout: pallas attention, scan_layers, selective
# remat (dots_attn). Logs under $DIR. Idempotent per stage (skips stages
# whose outputs exist) so an interrupted chain resumes where it stopped.
#
# Env knobs (the VM can be recycled mid-round and runs/ is uncommitted, so a
# session must pick a scale it can finish):
#   SYNTH_SCALE=paper|small|tiny   corpus size             (default paper)
#   SYNTH_DIR                      run directory           (default runs)
#   SYNTH_SKIP_A=1                 skip run A (random-init finetune)
#   SYNTH_SKIP_FTB=1               stop after zero-shot (skip run-B finetune)
#   SYNTH_PRETRAIN_EPOCHS          run-B pretrain epochs   (default 8)
set -uo pipefail
cd "$(dirname "$0")/.."
SCALE="${SYNTH_SCALE:-paper}"
DIR="${SYNTH_DIR:-runs}"
PRE_EPOCHS="${SYNTH_PRETRAIN_EPOCHS:-8}"
mkdir -p "$DIR"
PROD="--attention_impl pallas --scan_layers --remat --remat_policy dots_attn"

stamp() { echo "[protocol $(date +%H:%M:%S)] $*" | tee -a "$DIR"/protocol.log; }

# 0. corpus (paper scale: 5.3k/11k finetune, disjoint 8k/16k pretrain)
if [ ! -f "$DIR"/synth/stats.json ]; then
  stamp "generating corpus (scale=$SCALE)"
  python -m recformer_tpu.pipelines.synthetic --out "$DIR"/synth --scale "$SCALE" \
    2>&1 | tee "$DIR"/gen.log
fi

# A. two-stage finetune from random init (reference defaults: B=16, accum 8,
#    lr 5e-5, 16 epochs/stage, eval every 3, patience 5/3)
if [ -z "${SYNTH_SKIP_A:-}" ] && [ ! -f "$DIR"/ftA/finetune/test_metrics.json ]; then
  stamp "run A: two-stage finetune, random init"
  RESUME=""; [ -f "$DIR"/ftA/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path "$DIR"/synth/finetune \
    --output_dir "$DIR"/ftA $PROD $RESUME 2>&1 | tee -a "$DIR"/ftA.log
fi
[ -z "${SYNTH_SKIP_A:-}" ] && stamp "run A done: $(cat "$DIR"/ftA/finetune/test_metrics.json 2>/dev/null)"

# B1. pretrain on the DISJOINT item universe (canonical recipe; 8 epochs =
#     2k optimizer steps at eff. batch 64 at paper scale — enough to measure
#     transfer). steps_per_call 16: the axon relay costs ~1.8s host dispatch
#     per device call (measured: 63.9 ex/s in-call vs ~23 ex/s wall at 8
#     steps/call).
if [ ! -f "$DIR"/pretrain/config.json ]; then
  stamp "run B: pretraining"
  PRESUME=""; [ -d "$DIR"/pretrain/state ] && PRESUME=--resume
  python -m recformer_tpu.cli.pretrain --data_path "$DIR"/synth/pretrain \
    --output_dir "$DIR"/pretrain $PROD --steps_per_call 16 $PRESUME \
    --num_train_epochs "$PRE_EPOCHS" --warmup_steps 200 --valid_step_interval 1000 \
    2>&1 | tee "$DIR"/pretrain.log
fi

# B2. convert (pretrain ckpt -> seqrec init)
if [ ! -f "$DIR"/pretrain/config.json ]; then
  stamp "ABORT: pretrain did not complete (no config.json) — rerun to resume it"
  exit 4
fi
if [ ! -d "$DIR"/converted/seqrec ]; then
  stamp "run B: converting checkpoint"
  python -m recformer_tpu.cli.convert_ckpt --pretrain_ckpt "$DIR"/pretrain/best \
    --config "$DIR"/pretrain/config.json --output_dir "$DIR"/converted \
    2>&1 | tee "$DIR"/convert.log
fi

# B3. zero-shot eval of the pretrained model on the finetune corpus
#     (the paper's text-transfer claim, /root/reference/evaluate_seq.py)
if [ ! -d "$DIR"/converted/seqrec ]; then
  stamp "ABORT: checkpoint conversion failed — fix and rerun"
  exit 5
fi
if [ ! -f "$DIR"/zeroshot.json ]; then
  stamp "run B: zero-shot eval"
  python -m recformer_tpu.cli.evaluate_seq --data_path "$DIR"/synth/finetune \
    --ckpt "$DIR"/converted/seqrec $PROD --output_file "$DIR"/zeroshot.json \
    2>&1 | tee "$DIR"/zeroshot.log
fi
stamp "run B zero-shot: $(cat "$DIR"/zeroshot.json 2>/dev/null)"

# B4. two-stage finetune from the pretrained init
if [ -z "${SYNTH_SKIP_FTB:-}" ] && [ ! -f "$DIR"/ftB/finetune/test_metrics.json ]; then
  stamp "run B: two-stage finetune from pretrain"
  RESUME=""; [ -f "$DIR"/ftB/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path "$DIR"/synth/finetune \
    --output_dir "$DIR"/ftB --pretrain_ckpt "$DIR"/converted/seqrec $PROD $RESUME \
    2>&1 | tee -a "$DIR"/ftB.log
  stamp "run B done: $(cat "$DIR"/ftB/finetune/test_metrics.json 2>/dev/null)"
fi
stamp "ALL DONE"
