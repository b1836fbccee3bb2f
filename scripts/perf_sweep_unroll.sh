#!/usr/bin/env bash
# scan_unroll sweep on the production config (scan_layers + remat dots_attn):
# the round-1 diagnosis (docs/PERF.md) left the 65-vs-79 ex/s gap attributed
# to scan-boundary scheduling/fusion loss; unrolling N layers per scan
# iteration restores cross-layer fusion at ~N/12 of the unrolled program
# size. One bench line per unroll factor -> runs/unroll_sweep.jsonl.
# Do NOT run concurrently with another TPU job.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs
: > runs/unroll_sweep.jsonl
for u in 2 3 4 6; do
  echo "[sweep $(date +%H:%M:%S)] scan_unroll=$u" >&2
  python bench.py --scan_layers --remat --remat_policy dots_attn \
    --scan_unroll $u 2>runs/unroll_u$u.err | tail -1 | tee -a runs/unroll_sweep.jsonl
done
echo "[sweep] done" >&2
