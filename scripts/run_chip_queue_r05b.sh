#!/bin/bash
# Round-5b chip queue: the measurements cut short by the 16:2x tunnel
# hang. Leverage order; every run bounded; results appended durably.
#
# Usage:  bash scripts/run_chip_queue_r05b.sh [outdir]  # default log/chip_r05b
set -u
OUT=${1:-log/chip_r05b}
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

# 1. Train-schedule bench under the min-of-windows protocol (the
#    hardening landed in e1fa714; its confirmation run was the one
#    the hang killed). B=4 recipe geometry + B=8 best-batch.
run train_sched_robust_b4 2400 python benchmarks/bench_train.py 32 4
run train_sched_robust_b8 2400 python benchmarks/bench_train.py 32 8

# 2. Headline bench refresh under the robust protocol (driver format;
#    also refreshes BENCH_LAST_GOOD.json).
run bench 2400 env BENCH_PROBE_BACKOFFS= python bench.py

# 3. fp8-state TRAINING convergence head-to-head: upgrades the +11%
#    train-throughput win (docs/perf.md "fp8 states in training")
#    from throughput-only to accuracy-measured. 3 seeds x 600 steps,
#    bf16 vs e5m2 from identical init.
run fp8_train_conv 10800 python benchmarks/bench_state_convergence.py 100 6 bf16,e5m2 0,1,2

echo "=== queue done ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
python scripts/summarize_chip_queue.py "$OUT" > "$OUT/SUMMARY.md" 2>/dev/null || true
