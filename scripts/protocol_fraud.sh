#!/usr/bin/env bash
# Fraud-track leg of the north-star fallback: the reference's
# finetune_classification protocol (/root/reference/finetune_classification.py)
# on the synthetic transaction stream
# (recformer_tpu/pipelines/synthetic_transactions.py — planted text-learnable
# fraud signal) because the Kaggle credit-card CSVs are unreachable
# (docs/artifacts/download_attempt_round2.txt).
#
#   C3: fraud finetune, random init        -> runs/fraudA/.../test_metrics.json
#   C1: transactional pretrain (per-card sequence corpus, 85/15)
#   C2: convert -> fraud init
#   C4: fraud finetune, pretrained init    -> runs/fraudB/.../test_metrics.json
#
# C3 runs FIRST: it is independent of C1/C2, so a time-boxed session still
# lands one end-to-end fraud number even if the chain is cut.
#
# Scale/length are env-tunable (the VM can be recycled mid-round and runs/
# is not committed, so a session must pick a scale it can finish):
#   FRAUD_SCALE=paper|small|tiny   corpus size          (default paper)
#   FRAUD_PRETRAIN_EPOCHS          C1 epochs            (default 8)
#   FRAUD_CLS_EPOCHS / FRAUD_PATIENCE  C3/C4 epochs+patience (default 12/4)
#
# Idempotent per stage; do NOT run concurrently with protocol_synthetic.sh
# (one TPU, 2 host CPUs).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs
PROD="--attention_impl pallas --scan_layers --remat --remat_policy dots_attn --pooler_type avg"
SCALE="${FRAUD_SCALE:-paper}"
PRE_EPOCHS="${FRAUD_PRETRAIN_EPOCHS:-8}"
CLS_EPOCHS="${FRAUD_CLS_EPOCHS:-12}"
PATIENCE="${FRAUD_PATIENCE:-4}"

stamp() { echo "[fraud-protocol $(date +%H:%M:%S)] $*" | tee -a runs/protocol.log; }

if [ ! -f runs/txn/artifacts/smap.json ]; then
  stamp "generating transaction stream + artifacts (scale=$SCALE)"
  python -m recformer_tpu.pipelines.synthetic_transactions \
    --out runs/txn --scale "$SCALE" --build 2>&1 | tee runs/txn_gen.log
fi

if [ ! -f runs/fraudA/classification_data/test_metrics.json ]; then
  stamp "C3: fraud finetune, random init"
  R=""; [ -f runs/fraudA/classification_data/loop_state/loop.json ] && R=--resume
  python -m recformer_tpu.cli.finetune_classification \
    --data_path runs/txn/artifacts/classification_data \
    --output_dir runs/fraudA $PROD $R --learning_rate 1e-3 \
    --num_train_epochs "$CLS_EPOCHS" --patience "$PATIENCE" \
    2>&1 | tee -a runs/fraudA.log
fi

if [ ! -f runs/txn_pretrain/config.json ]; then
  stamp "C1: transactional pretrain"
  PRESUME=""; [ -d runs/txn_pretrain/state ] && PRESUME=--resume
  # steps_per_call 16: the axon relay costs ~1.8s of host dispatch per device
  # call (measured on run B: 63.9 ex/s in-call vs ~23 ex/s wall at 8
  # steps/call) — longer scan calls amortize it
  python -m recformer_tpu.cli.pretrain --data_path runs/txn/artifacts/pretrain_data \
    --output_dir runs/txn_pretrain $PROD --steps_per_call 16 $PRESUME \
    --num_train_epochs "$PRE_EPOCHS" --warmup_steps 50 --valid_step_interval 200 \
    2>&1 | tee -a runs/txn_pretrain.log
fi

if [ ! -d runs/txn_converted/fraud ]; then
  stamp "C2: converting transactional pretrain checkpoint"
  python -m recformer_tpu.cli.convert_ckpt --pretrain_ckpt runs/txn_pretrain/best \
    --config runs/txn_pretrain/config.json --output_dir runs/txn_converted \
    2>&1 | tee runs/txn_convert.log
fi

if [ ! -f runs/fraudB/classification_data/test_metrics.json ]; then
  stamp "C4: fraud finetune, pretrained init"
  R=""; [ -f runs/fraudB/classification_data/loop_state/loop.json ] && R=--resume
  python -m recformer_tpu.cli.finetune_classification \
    --data_path runs/txn/artifacts/classification_data \
    --pretrain_ckpt runs/txn_converted/fraud \
    --output_dir runs/fraudB $PROD $R \
    --num_train_epochs "$CLS_EPOCHS" --patience "$PATIENCE" \
    2>&1 | tee -a runs/fraudB.log
fi
stamp "FRAUD PROTOCOL DONE"
