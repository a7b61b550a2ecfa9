#!/bin/bash
# r12: the round-5 FINAL capture runbook — run when the tunnel is healthy.
# One process at a time (single-tenant device; process churn degrades the
# tunnel — and each 10M process leaves ~1h of HBM-reclaim degradation
# after it exits, so this runs the cheap captures FIRST).
#
# Usage: bash tools_dev/r12_capture.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r12_capture}"
mkdir -p "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site"

echo "== 1. tunnel health gate (abort if degraded)"
timeout 300 python tools_dev/r7n_rtt.py 2>&1 | tee "$OUT/rtt.txt"
MS=$(grep -o '[0-9.]* ms/step' "$OUT/rtt.txt" | cut -d' ' -f1)
if [ -z "$MS" ] || python -c "exit(0 if float('$MS') < 120 else 1)"; then
  echo "tunnel healthy (${MS} ms/step) — proceeding"
else
  echo "tunnel DEGRADED (${MS} ms/step) — aborting capture"; exit 3
fi

echo "== 2. radius batching at 1M (compute-dominated regime)"
SYZGY_RADIUS_N=1000000 timeout 1800 python benchmarks/radius_concurrent.py \
  2>&1 | tee "$OUT/radius1m.txt"

echo "== 3. headline bench (only in a TRULY healthy <60ms window)"
if python -c "exit(0 if float('$MS') < 60 else 1)"; then
  timeout 1800 python bench.py 2>&1 | tee "$OUT/bench.txt"
else
  echo "skipping bench.py (RTT ${MS} >= 60ms; r5 capture 82.3k stands)"
fi

echo "== 4. config5 churn-rate sweep at 10M (LAST: leaves HBM reclaim)"
SYZGY_MUT_RATES="19,200,2000,0" timeout 3600 \
  python benchmarks/config5_streaming.py 2>&1 | tee "$OUT/c5_sweep.txt"

echo "== capture complete; results in $OUT"
