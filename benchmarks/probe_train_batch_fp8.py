#!/usr/bin/env python3
"""GEN1 train-step throughput: state dtype x batch, step scan.

Round 5's inference batch sweep found the lane-axis regime (B=128
fills the 128-wide lane axis; 7 728 f/s vs 3 653 at B=8). The train
step has only ever been measured at the reference's recipe batch
(B=4-5, 537 f/s bf16 states, log/chip_r04b/train_sched.log) and fp8
states were only tried at 1Mpx (fastest there,
log/chip_r05/1mpx_train.log). This probes whether the same two levers
move the GEN1 BPTT train step:

  - batch: B in {4, 8, 16, 32, 64} (BPTT activations cap it well
    below the inference optimum; OOM rows are data points)
  - state dtype: bf16 vs e5m2 (fp8 halves carried-state HBM traffic;
    in training the state is ALSO saved for the backward pass, so the
    win could be larger than inference's +35%)

Per-chip throughput at larger batch informs the multi-chip recipe
(global batch = per-chip B x DP chips; LR scaling caveat documented
in docs/perf.md).

Usage: python benchmarks/probe_train_batch_fp8.py [T]
       PROBE_BATCHES=4,8,16 to trim.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from benchmarks.bench_train import measure

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BATCHES = tuple(
    int(s) for s in os.environ.get("PROBE_BATCHES", "4,8,16,32,64").split(",")
)


def main():
    rows = {}
    # Stage 1: batch sweep with the production train defaults
    # (remat=True). First pass measured: B=16 already OOMs the remote
    # compile helper WITH remat — GEN1 BPTT caps at B~8/chip, so the
    # lane-filling inference batches are out of reach for training.
    for name, state_dtype in (
        ("bf16_states", jnp.bfloat16),
        ("e5m2_states", jnp.float8_e5m2),
    ):
        for B in BATCHES:
            key = f"{name}_B{B}"
            try:
                rows[key] = measure(
                    T, B, False,
                    compute_dtype=jnp.bfloat16, state_dtype=state_dtype,
                )
            except Exception as e:  # OOM at a geometry is a data point
                rows[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({key: rows[key]}), flush=True)
    # Stage 2: the inference headline's compile knobs (remat=False,
    # scan_unroll=2 — bench.py) have never been tried on the TRAIN
    # step, where remat=True is the default. At B<=8 the no-remat
    # activation set may fit, trading HBM for the recompute FLOPs.
    B = int(os.environ.get("PROBE_VARIANT_BATCH", "8"))
    for name, state_dtype, kw in (
        ("bf16_noremat", jnp.bfloat16, dict(remat=False)),
        ("bf16_unroll2", jnp.bfloat16, dict(scan_unroll=2)),
        ("bf16_noremat_unroll2", jnp.bfloat16,
         dict(remat=False, scan_unroll=2)),
        ("e5m2_noremat", jnp.float8_e5m2, dict(remat=False)),
        ("e5m2_noremat_unroll2", jnp.float8_e5m2,
         dict(remat=False, scan_unroll=2)),
    ):
        key = f"{name}_B{B}"
        try:
            rows[key] = measure(
                T, B, False,
                compute_dtype=jnp.bfloat16, state_dtype=state_dtype, **kw,
            )
        except Exception as e:
            rows[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({key: rows[key]}), flush=True)
    print(json.dumps({
        "metric": f"gen1_train_batch_fp8_probe_T{T}",
        "batches": list(BATCHES),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
