#!/usr/bin/env bash
# End-to-end smoke test against a live server (reference: testserver.sh).
# Usage: scripts/testserver.sh [host:port]
set -euo pipefail
HOST="${1:-localhost:8080}"
B="http://$HOST/api/v1"

echo "== create collection"
curl -fsS -X POST "$B/collections" -H 'Content-Type: application/json' \
  -d '{"name":"smoke","vector_size":4,"quantization":8,"distance_function":"euclidean"}'
echo

echo "== insert records (array body)"
curl -fsS -X POST "$B/collections/smoke/records" -H 'Content-Type: application/json' \
  -d '[{"id":1,"vector":[0.1,0.2,0.3,0.4],"metadata":{"tag":"a"}},
       {"id":2,"vector":[0.9,0.8,0.7,0.6],"metadata":{"tag":"b"}}]'
echo

echo "== search"
curl -fsS -X POST "$B/collections/smoke/search" -H 'Content-Type: application/json' \
  -d '{"vector":[0.1,0.2,0.3,0.4],"k":1}'
echo

echo "== filtered search"
curl -fsS -X POST "$B/collections/smoke/search" -H 'Content-Type: application/json' \
  -d '{"vector":[0,0,0,0],"k":10,"filter":"tag == '\''b'\''"}'
echo

echo "== ids, stats, cleanup"
curl -fsS "$B/collections/smoke/ids"; echo
curl -fsS "$B/collections/smoke" | head -c 300; echo
curl -fsS -X DELETE "$B/collections/smoke"; echo
echo "smoke test passed"
