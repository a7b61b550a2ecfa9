#!/bin/bash
# r10: the round-5 TPU capture runbook — run when the tunnel is healthy.
# Order matters: cheapest/highest-value first, one process at a time
# (single-tenant device; process churn itself degrades the tunnel).
#
# Usage: bash tools_dev/r10_healthy_capture.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r10_capture}"
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

echo "== 2. headline bench (1M x 384, classic placement)"
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench.txt"

echo "== 3. re-probe (bench should not have degraded the device)"
timeout 300 python tools_dev/r7n_rtt.py 2>&1 | tee "$OUT/rtt2.txt"

echo "== 4. serving open-loop (config1_concurrent, >=600 target)"
timeout 1800 python benchmarks/config1_concurrent.py 2>&1 | tee "$OUT/c1.txt"

echo "== 5. radius batching on hardware"
timeout 1800 python benchmarks/radius_concurrent.py 2>&1 | tee "$OUT/radius.txt"

echo "== 6. config5 streaming at 10M (lean placement engages >2GB codes)"
timeout 3600 python benchmarks/config5_streaming.py 2>&1 | tee "$OUT/c5.txt"

echo "== capture complete; results in $OUT"
