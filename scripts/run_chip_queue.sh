#!/bin/bash
# Round-4 chip-gated measurement queue (ROADMAP.md "Queued chip work" +
# VERDICT round-3 items 1-3, 5-6). Designed for a SHORT or FLAKY tunnel
# window: runs the highest-leverage measurement first, bounds every run
# with a hard timeout, and appends each result to a durable log so a
# mid-queue outage still leaves everything up to that point recorded.
#
# Usage:  bash scripts/run_chip_queue.sh [outdir]   # default log/chip_r04
set -u
OUT=${1:-log/chip_r04}
cd "$(dirname "$0")/.."   # before mkdir: a relative OUT is repo-rooted
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

# 1. Driver-format headline bench (bf16 states + int8 PTQ composed).
#    The watcher's probe just succeeded, so skip bench.py's own retry
#    backoffs: one probe, and on failure the last-good replay fires
#    immediately instead of eating the 1800 s budget.
run bench 1800 env BENCH_PROBE_BACKOFFS= python bench.py

# 2. int8 PTQ accuracy re-bench after the dequant-precision fix (ad13da0).
run int8_ptq 1200 python benchmarks/bench_int8_ptq.py

# 3. Batch-scaling study: the MFU knee + int8 contribution, B in {8..64}.
run batch_scaling 1800 python benchmarks/bench_batch_scaling.py 8 16 32 64

# 4. Relayout/copy census of the compiled headline step (both layouts).
run hlo_auto 900 python benchmarks/hlo_pass_report.py
run hlo_default 900 python benchmarks/hlo_pass_report.py --no-auto-layout

# 5. 1Mpx training: step scan vs time-batched vs hybrid schedules
#    (VERDICT item 6 target: >=1.5x over the 3.76 s/step round-3 number).
run 1mpx_train 3600 python benchmarks/bench_1mpx_train.py

# 6. GEN1 train-step schedules at the reference geometry.
run train_sched 1800 python benchmarks/bench_train.py

# 6b. Space-to-depth stem: stage-1 unit + full model, both geometries.
run s2d_stem 1500 python benchmarks/bench_s2d_stem.py

# 7. Streaming engine after uint8 staging + double buffering
#    (round-3: ~38 cameras/chip; expect 45+).
run streaming 1200 python benchmarks/bench_streaming.py

# 8. Train-to-mAP regression gate (~20 min): the open accuracy claim.
run train_gate 2400 env RUN_TRAIN_GATE=1 SNN_TEST_PLATFORM=default \
  python -m pytest tests/test_train_gate.py -x -q -s

echo "=== queue done ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
python scripts/summarize_chip_queue.py "$OUT" > "$OUT/SUMMARY.md" 2>/dev/null || true
