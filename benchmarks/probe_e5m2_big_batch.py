#!/usr/bin/env python3
"""Probe e5m2-state inference beyond B=64.

The round-5 bench sweep stopped at B=64, where the e5m2 curve was
still rising (3 583 -> 4 962 f/s from B=32 -> 64, BENCH_r05): the
state-HBM term that produced the B=32 dip shrinks with e5m2, so the
copy-amortization regime may extend. This measures B in {64, 96, 128,
192} on the exact headline configuration to find the knee (HBM for
the uint8 input at B=192/T=32 is ~0.9 GB — far from the wall).

Usage:  python benchmarks/probe_e5m2_big_batch.py
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

from benchmarks._util import timeit  # noqa: E402

H, W = (
    tuple(int(v) for v in os.environ["BENCH_HW"].split("x"))
    if os.environ.get("BENCH_HW") else (240, 304)
)
T = int(os.environ.get("BENCH_T", "32"))
BATCHES = tuple(
    int(s) for s in os.environ.get("PROBE_BATCHES", "64,96,128,192").split(",")
)


def main():
    model = TinyYolo(
        num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
        state_dtype=jnp.float8_e5m2, remat=False, scan_unroll=2,
    )
    params, stats = model.init(jax.random.PRNGKey(0))

    def forward(p, s, x):
        (cls_p, box_p), _, _ = model.forward(p, s, x)
        # single scalar: _util.timeit syncs via float(output)
        return cls_p.sum() + box_p.sum()

    fwd = jax.jit(forward)
    rows = {}
    for B in BATCHES:
        X = jnp.asarray(
            np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1,
            jnp.uint8,
        )
        try:
            dt = timeit(fwd, params, stats, X)
            rows[B] = round(T * B / dt, 1)
        except Exception as e:  # OOM at some batch is the data point
            rows[B] = f"error: {type(e).__name__}"[:80]
        print(json.dumps({"B": B, "e5m2_frames_per_sec": rows[B]}),
              flush=True)
    print(json.dumps({
        "metric": "e5m2_big_batch_probe", "T": T, "rows": rows,
    }))


if __name__ == "__main__":
    main()
