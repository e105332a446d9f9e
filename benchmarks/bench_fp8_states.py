#!/usr/bin/env python3
"""fp8 neuron-state storage at the GEN1 headline geometry: speed + mAP.

The round-2 ablation pinned LIF state HBM traffic as the biggest
non-conv sink (≈ the convs themselves at fp32; bf16 states were the
1.6× round-3 win). fp8 storage (`state_dtype=float8_e4m3fn`, update
math still fp32) halves that traffic again — it already measured
FASTEST at the 1Mpx train geometry (30.2 vs 25.9 frames/s,
log/chip_r04b/1mpx_train.log) but was never tried on the GEN1
inference headline. This bench answers both halves of "is it a win":

  1. throughput: T=32 forward, B in {8, 16}, state_dtype in
     {bf16, e4m3, e5m2} on the trained synthetic checkpoint;
  2. task accuracy: synthetic-val mAP per state dtype, all arms inside
     ONE run (the 4-record val's run-to-run noise exceeds real deltas
     — docs/perf.md "int8 PTQ" postmortem).

Run on the real chip:
    python benchmarks/bench_fp8_states.py [ckpt_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.train import Trainer
from snn_for_object_detection_tpu.train.checkpoint import load_single

from benchmarks._util import timeit  # noqa: E402  (shared protocol)

H, W = 240, 304
# Smoke knobs (CPU sanity runs): BENCH_BATCHES trims the throughput
# sweep, BENCH_VAL_BATCHES the mAP pass.
BATCHES = tuple(
    int(b) for b in os.environ.get("BENCH_BATCHES", "8,16").split(",")
)
VAL_BATCHES = int(os.environ.get("BENCH_VAL_BATCHES", "32"))
STATE_DTYPES = (
    ("bf16", jnp.bfloat16),
    ("e4m3", jnp.float8_e4m3fn),
    ("e5m2", jnp.float8_e5m2),
)


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "nets/tiny_yolo_synth/model"
    restored = load_single(ckpt)
    params, stats = restored["params"], restored["stats"]

    out = {"metric": "fp8_states_gen1", "rows": []}

    # --- throughput ---
    T = int(os.environ.get("BENCH_T", "32"))
    for B in BATCHES:
        X = jnp.asarray(
            np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1,
            jnp.uint8,
        )
        row = {"batch": B}
        for name, sd in STATE_DTYPES:
            model = TinyYolo(
                num_classes=2, in_hw=(H, W), time_window=4,
                compute_dtype=jnp.bfloat16, state_dtype=sd,
            )
            fwd = jax.jit(lambda p, s, x, m=model: m.forward(p, s, x)[0][0].sum())
            dt = timeit(fwd, params, stats, X)
            row[f"{name}_frames_per_sec"] = round(T * B / dt, 1)
        print(json.dumps(row), flush=True)
        out["rows"].append(row)

    # --- task-level mAP, one run, same loader geometry as the int8 bench ---
    root = make_synthetic_dataset(
        "/tmp/int8_ptq_data", records_per_split=4, duration_ms=4000
    )
    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=4, num_workers=2,
        num_load_file=4, num_steps=12, time_step=16, time_shift=6,
        one_label=True, max_labels=64, seed=123,
    )
    maps = {}
    for name, sd in STATE_DTYPES:
        model = TinyYolo(
            num_classes=2, in_hw=(H, W), time_window=4,
            compute_dtype=jnp.bfloat16, state_dtype=sd,
        )
        trainer = Trainer(
            limit_val_batches=VAL_BATCHES,
            out_dir=f"/tmp/fp8_states_{name}", seed=123,
        )
        metrics = trainer.validate(model, dm, params, stats)
        maps[name] = {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if k in ("map", "map_50", "mar_1", "mar_10", "mar_100")
        }
        print(f"[{name}] {maps[name]}", flush=True)
    out["map"] = maps
    out["map_50_delta_e4m3"] = round(
        maps["e4m3"]["map_50"] - maps["bf16"]["map_50"], 4
    )
    out["map_50_delta_e5m2"] = round(
        maps["e5m2"]["map_50"] - maps["bf16"]["map_50"], 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
