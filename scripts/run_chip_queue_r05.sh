#!/bin/bash
# Round-5 chip-gated measurement queue (VERDICT round-4 items 3-5, 8).
# Highest-leverage first, every run bounded, results appended durably
# so a mid-queue tunnel outage still leaves everything recorded.
#
# Usage:  bash scripts/run_chip_queue_r05.sh [outdir]  # default log/chip_r05
set -u
OUT=${1:-log/chip_r05}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

# 1. Streaming step breakdown: where the 151/183 ms goes + the nozero
#    and fetch-before-dispatch candidates (VERDICT item 8).
run streaming_probe 1200 python benchmarks/probe_streaming_breakdown.py 32

# 2. MFU decomposition of the B=8 headline forward (VERDICT item 4).
run ablation 1800 python benchmarks/bench_ablation.py 32 8

# 3. fp8 neuron-state storage at the GEN1 headline geometry: the one
#    un-tried candidate the 1Mpx sweep already showed winning.
run fp8_states 2400 python benchmarks/bench_fp8_states.py

# 4. 1Mpx train sweep re-run: every row now compiles or reports a
#    documented OOM (VERDICT item 3 close-out).
run 1mpx_train 3600 python benchmarks/bench_1mpx_train.py

# 5. Headline bench refresh (driver format).
run bench 1800 env BENCH_PROBE_BACKOFFS= python bench.py

# 6. EMA head-to-head, 3 seeds x {off, 0.99, 0.999} (VERDICT item 5).
#    Longest run last; supervisor-restartable via ckpt_path=auto.
run ema 10800 python benchmarks/bench_ema.py 100 6 0,1,2 off,0.99,0.999

echo "=== queue done ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
python scripts/summarize_chip_queue.py "$OUT" > "$OUT/SUMMARY.md" 2>/dev/null || true
