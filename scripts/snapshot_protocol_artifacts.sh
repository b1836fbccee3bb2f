#!/usr/bin/env bash
# Copy the durable protocol results out of the gitignored runs/ tree into
# docs/artifacts/protocol_r4/ so they survive VM recycling (round 2 lost
# runs/ entirely — VERDICT r2 "What's missing" #1/#5; round 3's synthetic
# run checkpoints were lost the same way). Idempotent; run after any
# protocol milestone, then commit. DST overridable: SNAP_DST=... for older
# rounds.
set -uo pipefail
cd "$(dirname "$0")/.."
DST="${SNAP_DST:-docs/artifacts/protocol_r4}"
mkdir -p "$DST"

copy() { [ -e "$1" ] && cp "$1" "$DST/$2" && echo "  $2"; }

echo "[snapshot] mechanism experiment (shared-kernel A'/B'):"
copy runs/mech/protocol.log mech_protocol.log
copy runs/mech/synth/stats.json mech_stats.json
copy runs/mech/pretrain/logs/metrics.jsonl mech_pretrain_metrics.jsonl
copy runs/mech/zeroshot.json mech_zeroshot.json
copy runs/mech/ftA/finetune/test_metrics.json mech_ftA_test_metrics.json
copy runs/mech/ftB/finetune/test_metrics.json mech_ftB_test_metrics.json
copy runs/mech/ftA.log mech_ftA.log
copy runs/mech/ftB.log mech_ftB.log

echo "[snapshot] synthetic protocol (default corpus):"
copy runs/protocol.log protocol.log
copy runs/synth/stats.json synth_stats.json
copy runs/pretrain/logs/metrics.jsonl pretrain_metrics.jsonl
copy runs/zeroshot.json zeroshot.json
copy runs/ftA/finetune/test_metrics.json ftA_test_metrics.json
copy runs/ftB/finetune/test_metrics.json ftB_test_metrics.json
copy runs/ftA.log ftA.log
copy runs/ftB.log ftB.log

echo "[snapshot] fraud protocol:"
copy runs/txn/protocol.log fraud_protocol.log
copy runs/txn/stats.json txn_stats.json
copy runs/txn/pretrain/logs/metrics.jsonl txn_pretrain_metrics.jsonl
copy runs/txn/fraudA/classification_data/test_metrics.json fraudA_test_metrics.json
copy runs/txn/fraudA/classification_data/epoch_metrics.json fraudA_epoch_metrics.json
copy runs/txn/fraudB/classification_data/test_metrics.json fraudB_test_metrics.json
copy runs/txn/fraudB/classification_data/epoch_metrics.json fraudB_epoch_metrics.json
copy runs/txn/fraudA.log fraudA.log
copy runs/txn/fraudB.log fraudB.log

echo "[snapshot] perf:"
copy runs/unroll_sweep.jsonl unroll_sweep.jsonl
echo "[snapshot] done -> $DST"
