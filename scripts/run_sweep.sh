#!/bin/bash
# Resilient perf sweep: each config in its own process with timeout+retry
# (the TPU tunnel on this machine is intermittent; see ROUND1.md).
cd "$(dirname "$0")/.."
OUT=${1:-perf_sweep_log.jsonl}
shift 2>/dev/null
CONFIGS=${@:-"cggi:64 cggi-bm:64 cggi-fused:64 cggi:256 cggi-bm:256 lmss:64 kms2:16 kms2-bm:16 kms8:8 kms8-bm:8"}
for cfg in $CONFIGS; do
  for attempt in 1 2 3; do
    echo "=== $cfg attempt $attempt ===" >&2
    if timeout 1500 python scripts/perf_sweep.py "$cfg" 2>/dev/null | tee -a "$OUT" | grep -q '"config"'; then
      break
    fi
    sleep 30
  done
done
