#!/bin/bash
# r12 watcher: probe tunnel RTT every WAIT_S; when a window opens
# (<120 ms/step), immediately run the r12 capture runbook. Probes are
# tiny (256x256, ~zero HBM churn). Writes state to $OUT/watch.log.
#
# Deadline: /tmp/r12_deadline (epoch seconds, re-read every loop) — the
# watcher exits and never starts a capture past it, so the single-tenant
# TPU is guaranteed free when the driver runs bench.py at round end.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r12_capture}"
WAIT_S="${WAIT_S:-900}"
mkdir -p "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site"
deadline() { cat /tmp/r12_deadline 2>/dev/null || echo 9999999999; }
while true; do
  if [ "$(date +%s)" -ge "$(deadline)" ]; then
    echo "$(date -u +%H:%M:%S) deadline passed — watcher exiting" \
      >> "$OUT/watch.log"
    exit 0
  fi
  TS=$(date -u +%H:%M:%S)
  MS=$(timeout 300 python tools_dev/r7n_rtt.py 2>/dev/null \
       | grep -o '[0-9.]* ms/step' | cut -d' ' -f1)
  echo "$TS rtt=${MS:-timeout}" >> "$OUT/watch.log"
  if [ -n "${MS:-}" ] && python -c "exit(0 if float('$MS') < 120 else 1)"; then
    echo "$TS window open (${MS} ms) — launching capture" >> "$OUT/watch.log"
    DEADLINE_EPOCH="$(deadline)" bash tools_dev/r12_capture.sh "$OUT" \
      >> "$OUT/capture.log" 2>&1
    RC=$?
    echo "$(date -u +%H:%M:%S) capture exit=$RC" >> "$OUT/watch.log"
    [ $RC -eq 0 ] && exit 0   # full capture done
    # exit 3 = runbook's own gate saw degradation mid-flight; keep watching
  fi
  sleep "$WAIT_S"
done
