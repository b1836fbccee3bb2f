#!/usr/bin/env bash
# Production-config gap sweep (VERDICT r2 item 3): the compile-friendly
# production config (scan_layers + remat dots_attn) measured 65 ex/s vs 77.7
# unrolled — attributed to scan-boundary scheduling/fusion loss but never
# measured. This sweep isolates the two knobs and the unroll middle ground:
#
#   scan+remat u=1,2,3,4,6   unrolling N layers/iter restores cross-layer
#                            fusion at ~N/12 of the unrolled program size
#   scan only (no remat)     isolates the scan-boundary cost
#   remat only (no scan)     isolates the remat recompute cost
#
# One bench JSON line per config -> runs/unroll_sweep.jsonl.
# Do NOT run concurrently with another TPU job.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs
: > runs/unroll_sweep.jsonl
run_one() {
  local tag="$1"; shift
  echo "[sweep $(date +%H:%M:%S)] $tag" >&2
  local line
  line=$(python bench.py "$@" 2>"runs/sweep_$tag.err" | tail -1)
  echo "{\"config\": \"$tag\", ${line#\{}" | tee -a runs/unroll_sweep.jsonl
}
# most-informative-first so a time-boxed partial sweep still answers the
# headline question (u3 = best expected fusion/compile trade-off)
for u in 3 2 4 6; do
  run_one "scan_remat_u$u" --scan_layers --remat --remat_policy dots_attn --scan_unroll "$u"
done
run_one "scan_only" --scan_layers
run_one "remat_only" --remat --remat_policy dots_attn
echo "[sweep] done" >&2
