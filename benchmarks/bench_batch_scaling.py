#!/usr/bin/env python3
"""Batch-scaling study for the headline inference geometry (VERDICT
round-3 item: close the end-to-end vs conv-only MFU gap).

Sweeps the batch dimension at T=32 GEN1 and reports frames/s +
achieved TFLOP/s for each of {bf16, bf16+int8-ptq}, so the knee of the
batch curve and the int8 contribution are measured on the same wall
clock. FLOP model: 7.62 GFLOP/frame (docs/perf.md:21, conv MACs x2 at
240x304 TinyYolo).

Run on the real chip:
    python benchmarks/bench_batch_scaling.py [B ...]   # default 8 16 32 64
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.ops import quantize as Q

T = 32
H, W = 240, 304
GFLOP_PER_FRAME = 7.62


def time_forward(model, p, stats, X) -> float:
    # the headline bench owns the compile-and-time methodology; share
    # it so the scaling study stays comparable to BENCH_r*.json numbers
    from bench import time_compiled_forward

    def forward(p, stats, X):
        (cls_p, box_p), _, _ = model.forward(p, stats, X)
        return cls_p.sum(), box_p.sum()

    return time_compiled_forward(forward, p, stats, X)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    model = TinyYolo(
        num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
        state_dtype=jnp.bfloat16, remat=False, scan_unroll=2,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    rows = []
    for B in batches:
        X = jnp.asarray(
            np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1,
            jnp.uint8,
        )
        row = {"batch": B}
        try:
            dt = time_forward(model, params, stats, X)
            row["bf16_frames_per_sec"] = round(T * B / dt, 1)
            row["bf16_tflops"] = round(
                T * B / dt * GFLOP_PER_FRAME / 1e3, 2
            )
        except Exception as e:  # OOM at large B is a finding, not a crash
            row["bf16_error"] = f"{type(e).__name__}: {e}"[:160]
        try:
            absmax = Q.calibrate(model, params, stats, X[:8, :4])
            qparams = Q.quantize(params, absmax)
            dt = time_forward(model, qparams, stats, X)
            row["int8_frames_per_sec"] = round(T * B / dt, 1)
            row["int8_tflops"] = round(
                T * B / dt * GFLOP_PER_FRAME / 1e3, 2
            )
        except Exception as e:
            row["int8_error"] = f"{type(e).__name__}: {e}"[:160]
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "batch_scaling_T32", "rows": rows}))


if __name__ == "__main__":
    main()
