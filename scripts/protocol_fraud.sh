#!/usr/bin/env bash
# Fraud-track leg of the north-star fallback: the reference's
# finetune_classification protocol (/root/reference/finetune_classification.py)
# on the synthetic transaction stream
# (recformer_tpu/pipelines/synthetic_transactions.py — planted text-learnable
# fraud signal, learnability proven by benchmarks/fraud_oracle.py: test AUC
# 0.949 at paper scale) because the Kaggle credit-card CSVs are unreachable
# (docs/artifacts/download_attempt_round2.txt).
#
#   C3: fraud finetune, random init        -> $DIR/fraudA/.../test_metrics.json
#   C1: transactional pretrain (per-card sequence corpus, 85/15)
#   C2: convert -> fraud init
#   C4: fraud finetune, pretrained init    -> $DIR/fraudB/.../test_metrics.json
#
# C3 runs FIRST: it is independent of C1/C2, so a time-boxed session still
# lands one end-to-end fraud number even if the chain is cut.
#
# Scale/length/dir are env-tunable (the VM can be recycled mid-round and runs/
# is not committed, so a session must pick a scale it can finish):
#   FRAUD_DIR                      run directory        (default runs/txn)
#   FRAUD_SCALE=paper|small|tiny   corpus size          (default paper)
#   FRAUD_PRETRAIN_EPOCHS          C1 epochs            (default 24)
#   FRAUD_CLS_EPOCHS / FRAUD_PATIENCE  C3/C4 epochs+patience (default 16/5)
#
# The generated corpus records its scale ($DIR/stats.json card count); a rerun
# with a mismatched FRAUD_SCALE aborts instead of silently reusing the old
# corpus (advisor r2: the round-2 "paper" run actually trained on a stale
# small-scale corpus this way).
#
# Hyperparameters (changed from round 2, which was degenerate — test AUC at
# or below 0.5 for BOTH inits): C3 no longer overrides the learning rate to
# 1e-3 (divergent for the 110M encoder from random init; both legs now use
# the reference's 5e-5), pretrain runs 24 epochs (round 2's 8 plateaued at
# dev contrastive accuracy 0.286), and finetune gets 16 epochs / patience 5.
#
# Round 3 second fix (discriminative LR): with ONE lr both legs stay
# degenerate — 5e-5 cannot train the freshly-initialized 3-layer MLP head
# within the step budget, 1e-3 diverges the encoder (docs/RESULTS.md leg 3
# isolates this to the head recipe: oracle AUC 0.949, backbone dev 0.417).
# C3/C4 now run encoder at 5e-5 + head at FRAUD_HEAD_LR (default 1e-3):
#   FRAUD_HEAD_LR                  --head_lr for C3/C4  (default 1e-3)
#
# Idempotent per stage; do NOT run concurrently with protocol_synthetic.sh
# (one TPU, 2 host CPUs).
set -uo pipefail
cd "$(dirname "$0")/.."
PROD="--attention_impl pallas --scan_layers --remat --remat_policy dots_attn --pooler_type avg"
DIR="${FRAUD_DIR:-runs/txn}"
SCALE="${FRAUD_SCALE:-paper}"
PRE_EPOCHS="${FRAUD_PRETRAIN_EPOCHS:-24}"
CLS_EPOCHS="${FRAUD_CLS_EPOCHS:-16}"
PATIENCE="${FRAUD_PATIENCE:-5}"
HEAD_LR="${FRAUD_HEAD_LR:-1e-3}"
# durable per-epoch metric mirror (VERDICT r4 weak #5)
MIRROR="${FRAUD_MIRROR_DIR:-docs/artifacts/protocol_r5}"
mkdir -p "$DIR" "$MIRROR"

stamp() { echo "[fraud-protocol $(date +%H:%M:%S)] $*" | tee -a "$DIR"/protocol.log; }
# artifact guard (VERDICT r3 item 7): a stage may not "finish" silently
require() { [ -e "$1" ] || { stamp "ABORT: stage '$2' finished without its artifact $1"; exit 9; }; }

case "$SCALE" in
  paper) WANT_CARDS=3800 ;;
  small) WANT_CARDS=500 ;;
  tiny)  WANT_CARDS=80 ;;
  *) echo "unknown FRAUD_SCALE=$SCALE" >&2; exit 2 ;;
esac

if [ ! -f "$DIR"/artifacts/smap.json ]; then
  stamp "generating transaction stream + artifacts (scale=$SCALE)"
  python -m recformer_tpu.pipelines.synthetic_transactions \
    --out "$DIR" --scale "$SCALE" --build 2>&1 | tee "$DIR"/gen.log
fi
GOT_CARDS=$(python -c "import json;print(json.load(open('$DIR/stats.json'))['cards'])")
if [ "$GOT_CARDS" != "$WANT_CARDS" ]; then
  stamp "ABORT: $DIR holds a $GOT_CARDS-card corpus but FRAUD_SCALE=$SCALE needs $WANT_CARDS — use a fresh FRAUD_DIR"
  exit 3
fi

if [ ! -f "$DIR"/fraudA/classification_data/test_metrics.json ]; then
  stamp "C3: fraud finetune, random init"
  R=""; [ -f "$DIR"/fraudA/classification_data/loop_state/loop.json ] && R=--resume
  python -m recformer_tpu.cli.finetune_classification \
    --data_path "$DIR"/artifacts/classification_data \
    --output_dir "$DIR"/fraudA $PROD $R --head_lr "$HEAD_LR" \
    --num_train_epochs "$CLS_EPOCHS" --patience "$PATIENCE" \
    --mirror_file "$MIRROR/fraudA_dev.jsonl" \
    2>&1 | tee -a "$DIR"/fraudA.log
fi
require "$DIR"/fraudA/classification_data/test_metrics.json "C3"
stamp "C3 test: $(cat "$DIR"/fraudA/classification_data/test_metrics.json 2>/dev/null)"

if [ ! -f "$DIR"/pretrain/config.json ]; then
  stamp "C1: transactional pretrain"
  PRESUME=""; [ -d "$DIR"/pretrain/state ] && PRESUME=--resume
  # steps_per_call 16: the axon relay costs ~1.8s of host dispatch per device
  # call — longer scan calls amortize it
  python -m recformer_tpu.cli.pretrain --data_path "$DIR"/artifacts/pretrain_data \
    --output_dir "$DIR"/pretrain $PROD --steps_per_call 16 $PRESUME \
    --num_train_epochs "$PRE_EPOCHS" --warmup_steps 100 --valid_step_interval 200 \
    --mirror_file "$MIRROR/fraud_pretrain_metrics.jsonl" \
    2>&1 | tee -a "$DIR"/pretrain.log
fi

if [ ! -d "$DIR"/converted/fraud ]; then
  stamp "C2: converting transactional pretrain checkpoint"
  python -m recformer_tpu.cli.convert_ckpt --pretrain_ckpt "$DIR"/pretrain/best \
    --config "$DIR"/pretrain/config.json --output_dir "$DIR"/converted \
    2>&1 | tee "$DIR"/convert.log
fi

if [ ! -f "$DIR"/fraudB/classification_data/test_metrics.json ]; then
  stamp "C4: fraud finetune, pretrained init"
  R=""; [ -f "$DIR"/fraudB/classification_data/loop_state/loop.json ] && R=--resume
  python -m recformer_tpu.cli.finetune_classification \
    --data_path "$DIR"/artifacts/classification_data \
    --pretrain_ckpt "$DIR"/converted/fraud \
    --output_dir "$DIR"/fraudB $PROD $R --head_lr "$HEAD_LR" \
    --num_train_epochs "$CLS_EPOCHS" --patience "$PATIENCE" \
    --mirror_file "$MIRROR/fraudB_dev.jsonl" \
    2>&1 | tee -a "$DIR"/fraudB.log
fi
require "$DIR"/fraudB/classification_data/test_metrics.json "C4"
stamp "C4 test: $(cat "$DIR"/fraudB/classification_data/test_metrics.json 2>/dev/null)"
stamp "FRAUD PROTOCOL DONE"
