#!/usr/bin/env bash
# Batch-size x remat sweep on the CURRENT kernel (VERDICT r4 weak #2: the
# only B=32 numbers predated the flat-lane layout / operand-concat globals /
# tanh-GELU; the round-3 sweep varied scan/remat/unroll but never batch).
#
# Measures B in {16,24,32} x {unrolled-noremat, remat save_attention,
# remat dots_attn} for the pretrain task on an IDLE chip (do not run while
# any other job owns the TPU — relay time-slicing garbles measurements).
# Warm the compile cache first with `bench.py --compile-only <flags>`.
#
# Appends one JSON line per cell to $OUT (default
# docs/artifacts/perf_sweep_batch_r5.jsonl) — append-only, recycle-proof.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${OUT:-docs/artifacts/perf_sweep_batch_r5.jsonl}"
mkdir -p "$(dirname "$OUT")"
for B in 16 24 32; do
  for R in "" "--remat --remat_policy save_attention" "--remat --remat_policy dots_attn"; do
    # b16 unrolled-noremat is the incumbent production config; keep it in the
    # sweep as the same-session control.
    echo "=== B=$B remat='${R:-none}'" >&2
    line=$(timeout 3600 python bench.py --batch-size "$B" $R | tail -1) || { echo "FAILED B=$B $R" >&2; continue; }
    python -c '
import json, sys
d = json.loads(sys.argv[1]); d["batch"] = int(sys.argv[2]); d["remat"] = sys.argv[3] or "none"
print(json.dumps(d))' "$line" "$B" "${R#--remat --remat_policy }" | tee -a "$OUT"
  done
done
