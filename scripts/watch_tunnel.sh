#!/bin/bash
# Probe the TPU tunnel until it answers, then run the round-4 chip
# queue exactly once. Designed to sit in a tmux pane during an outage
# (round-3 lesson: outages last hours; chip work must start the moment
# the tunnel recovers, not when a human notices).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-log/chip_r04}
mkdir -p "$OUT"
while true; do
  echo "[watch] probing $(date -u +%H:%M:%S)" | tee -a "$OUT/watch.log"
  if timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print(jax.devices())" >> "$OUT/watch.log" 2>&1; then
    echo "[watch] tunnel UP $(date -u +%H:%M:%S) — running chip queue" | tee -a "$OUT/watch.log"
    bash scripts/run_chip_queue.sh "$OUT"
    echo "[watch] chip queue finished $(date -u +%H:%M:%S)" | tee -a "$OUT/watch.log"
    break
  fi
  echo "[watch] down; retry in 300s" | tee -a "$OUT/watch.log"
  sleep 300
done
