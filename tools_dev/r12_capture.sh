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

DEADLINE="${DEADLINE_EPOCH:-9999999999}"
gate() {  # abort between steps once the watcher's hard deadline passes,
  # so a capture that started just inside a window cannot hold the
  # single-tenant device into the round-end bench
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline passed before step '$1' — stopping capture"; exit 3
  fi
}

echo "== 1. tunnel health gate (abort if degraded)"
timeout 300 python tools_dev/r7n_rtt.py 2>&1 | tee "$OUT/rtt.txt"
MS=$(grep -o '[0-9.]* ms/step' "$OUT/rtt.txt" | cut -d' ' -f1)
# an empty MS means the probe itself timed out or crashed — that IS the
# degraded mode (must not fall through to the healthy branch)
if [ -n "$MS" ] && python -c "exit(0 if float('$MS') < 120 else 1)"; then
  echo "tunnel healthy (${MS} ms/step) — proceeding"
else
  echo "tunnel DEGRADED (${MS:-probe-failed} ms/step) — aborting"; exit 3
fi

gate "radius"
echo "== 2. radius batching at 1M (compute-dominated regime)"
SYZGY_RADIUS_N=1000000 timeout 1800 python benchmarks/radius_concurrent.py \
  2>&1 | tee "$OUT/radius1m.txt"

gate "bench"
echo "== 3. headline bench (only in a TRULY healthy <60ms window)"
if python -c "exit(0 if float('$MS') < 60 else 1)"; then
  timeout 1800 python bench.py 2>&1 | tee "$OUT/bench.txt"
else
  echo "skipping bench.py (RTT ${MS} >= 60ms; r5 capture 82.3k stands)"
fi

gate "config5"
echo "== 4. config5 churn-rate sweep at 10M (LAST: leaves HBM reclaim)"
SYZGY_MUT_RATES="19,200,2000,0" timeout 3600 \
  python benchmarks/config5_streaming.py 2>&1 | tee "$OUT/c5_sweep.txt"

echo "== capture complete; results in $OUT"
