#!/usr/bin/env python3
"""1Mpx inference throughput sweep: batch x state dtype.

The 1Mpx headline (5.75 ms/frame = 174 f/s, docs/perf.md) predates
both round-5 wins — the lane-axis batch sweep and e5m2 carried
states. This sweeps B at T=16 for bf16 vs e5m2 states on the 720p
7-class TinyYolo to find the serving-throughput optimum. OOM rows are
data points (720p activations are ~12x GEN1's per frame; the batch
ceiling arrives far below GEN1's 128 — the question is where).

Usage: python benchmarks/probe_1mpx_infer_sweep.py
       PROBE_BATCHES=4,8 BENCH_T=16 to trim.
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

from benchmarks._util import timeit  # noqa: E402  (shared protocol)

H, W = 720, 1280
T = int(os.environ.get("BENCH_T", "16"))
BATCHES = tuple(
    int(s) for s in os.environ.get("PROBE_BATCHES", "4,8,16,32").split(",")
)


def main():
    rows = {}
    for name, sd in (("bf16", jnp.bfloat16), ("e5m2", jnp.float8_e5m2)):
        model = TinyYolo(
            num_classes=7, in_hw=(H, W), compute_dtype=jnp.bfloat16,
            state_dtype=sd, remat=False, scan_unroll=2,
        )
        params, stats = model.init(jax.random.PRNGKey(0))

        def forward(p, s, x, model=model):
            (cls_p, box_p), _, _ = model.forward(p, s, x)
            return cls_p.sum() + box_p.sum()

        fwd = jax.jit(forward)
        for B in BATCHES:
            key = f"{name}_B{B}"
            X = jnp.asarray(
                np.random.default_rng(0).random((T, B, H, W, 2)) < 0.05,
                jnp.uint8,
            )
            try:
                dt = timeit(fwd, params, stats, X, reps=6, windows=3)
                rows[key] = round(T * B / dt, 1)
            except Exception as e:  # OOM at a batch is the data point
                rows[key] = f"error: {type(e).__name__}"[:80]
            print(json.dumps({key: rows[key]}), flush=True)
    print(json.dumps({
        "metric": "1mpx_infer_sweep", "T": T, "hw": [H, W], "rows": rows,
    }))


if __name__ == "__main__":
    main()
