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
#   SYNTH_SHARED=1                 shared-kernel corpus variant (mechanism
#                                  experiment, VERDICT r3 item 3)
#   SYNTH_FT_EPOCHS                per-stage finetune epoch cap (default 16;
#                                  set ~30 so patience — not the cap —
#                                  terminates stage 2, VERDICT r3 item 4)
set -uo pipefail
cd "$(dirname "$0")/.."
SCALE="${SYNTH_SCALE:-paper}"
DIR="${SYNTH_DIR:-runs}"
PRE_EPOCHS="${SYNTH_PRETRAIN_EPOCHS:-8}"
FT_EPOCHS="${SYNTH_FT_EPOCHS:-16}"
SHARED_FLAG=""; WANT_SHARED=false; PFX=""
[ -n "${SYNTH_SHARED:-}" ] && { SHARED_FLAG=--shared_kernel; WANT_SHARED=true; PFX=mech_; }
# Durable per-epoch metric mirror (VERDICT r4 weak #5: a VM recycle wiping
# $DIR must lose checkpoints, never numbers). Every driver below appends its
# dev/test rows here the moment they are produced; commit this dir often.
MIRROR="${SYNTH_MIRROR_DIR:-docs/artifacts/protocol_r5}"
mkdir -p "$DIR" "$MIRROR"
PROD="--attention_impl pallas --scan_layers --remat --remat_policy dots_attn"

stamp() { echo "[protocol $(date +%H:%M:%S)] $*" | tee -a "$DIR"/protocol.log; }
# artifact guard (VERDICT r3 item 7): a stage may not "finish" silently —
# its output artifact must exist or the chain aborts here and now
require() { [ -e "$1" ] || { stamp "ABORT: stage '$2' finished without its artifact $1"; exit 9; }; }

# 0. corpus (paper scale: 5.3k/11k finetune, disjoint 8k/16k pretrain)
if [ ! -f "$DIR"/synth/stats.json ]; then
  stamp "generating corpus (scale=$SCALE shared=$WANT_SHARED)"
  python -m recformer_tpu.pipelines.synthetic --out "$DIR"/synth --scale "$SCALE" \
    $SHARED_FLAG 2>&1 | tee "$DIR"/gen.log
fi
require "$DIR"/synth/stats.json "corpus"
GOT_SHARED=$(python -c "import json;print(str(json.load(open('$DIR/synth/stats.json')).get('shared_kernel',False)).lower())")
if [ "$GOT_SHARED" != "$WANT_SHARED" ]; then
  stamp "ABORT: $DIR/synth holds shared_kernel=$GOT_SHARED corpus but this run wants $WANT_SHARED — use a fresh SYNTH_DIR"
  exit 3
fi

# A. two-stage finetune from random init (reference defaults: B=16, accum 8,
#    lr 5e-5, 16 epochs/stage, eval every 3, patience 5/3)
if [ -z "${SYNTH_SKIP_A:-}" ] && [ ! -f "$DIR"/ftA/finetune/test_metrics.json ]; then
  stamp "run A: two-stage finetune, random init"
  RESUME=""; [ -f "$DIR"/ftA/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path "$DIR"/synth/finetune \
    --num_train_epochs "$FT_EPOCHS" --mirror_file "$MIRROR/${PFX}ftA_dev.jsonl" \
    --output_dir "$DIR"/ftA $PROD $RESUME 2>&1 | tee -a "$DIR"/ftA.log
fi
if [ -z "${SYNTH_SKIP_A:-}" ]; then
  require "$DIR"/ftA/finetune/test_metrics.json "run A"
  stamp "run A done: $(cat "$DIR"/ftA/finetune/test_metrics.json 2>/dev/null)"
fi

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
    --mirror_file "$MIRROR/${PFX}pretrain_metrics.jsonl" \
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
require "$DIR"/zeroshot.json "zero-shot"
cp "$DIR"/zeroshot.json "$MIRROR/${PFX}zeroshot.json"
cp "$DIR"/synth/stats.json "$MIRROR/${PFX}stats.json"
stamp "run B zero-shot: $(cat "$DIR"/zeroshot.json 2>/dev/null)"

# B4. two-stage finetune from the pretrained init
if [ -z "${SYNTH_SKIP_FTB:-}" ] && [ ! -f "$DIR"/ftB/finetune/test_metrics.json ]; then
  stamp "run B: two-stage finetune from pretrain"
  RESUME=""; [ -f "$DIR"/ftB/finetune/loop_state/loop.json ] && RESUME=--resume
  python -m recformer_tpu.cli.finetune --data_path "$DIR"/synth/finetune \
    --num_train_epochs "$FT_EPOCHS" --mirror_file "$MIRROR/${PFX}ftB_dev.jsonl" \
    --output_dir "$DIR"/ftB --pretrain_ckpt "$DIR"/converted/seqrec $PROD $RESUME \
    2>&1 | tee -a "$DIR"/ftB.log
fi
if [ -z "${SYNTH_SKIP_FTB:-}" ]; then
  require "$DIR"/ftB/finetune/test_metrics.json "run B finetune"
  stamp "run B done: $(cat "$DIR"/ftB/finetune/test_metrics.json 2>/dev/null)"
fi
stamp "ALL DONE"
