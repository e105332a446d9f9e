#!/usr/bin/env python3
"""Task-level accuracy of reduced-precision neuron-state INFERENCE.

The perf headlines (bf16 states: baseline inference config; fp8 e4m3
states: +15%) were validated in round 2 only by prediction-correlation
probes on random init. This benchmark closes the loop at the task
level: load a TRAINED checkpoint (fp32-state training), evaluate
synthetic-val mAP with the state storage dtype swept across
{fp32, bf16, fp8}, and report the deltas. The reference bar for what
"accuracy" means is the mAP key set of
/root/reference/models/soda.py:283-292.

Usage (after a convergence run or with any training checkpoint):
    python benchmarks/bench_state_inference_map.py <ckpt_dir> [data_root]

ckpt_dir: an Orbax checkpoint holding at least {params, stats}
          (e.g. /tmp/state_conv_f32_s0/checkpoints/last or
          nets/tiny_yolo_synth/model).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.train import Trainer
from snn_for_object_detection_tpu.train.checkpoint import load_single

STATE_DTYPES = {
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
    "fp8_e4m3": jnp.float8_e4m3fn,
    # e5m2 is the shipped headline dtype (round 5) — deployments
    # re-check their own checkpoint with this script before enabling.
    "fp8_e5m2": jnp.float8_e5m2,
}


def main():
    ckpt = sys.argv[1]
    root = (
        sys.argv[2]
        if len(sys.argv) > 2
        else make_synthetic_dataset(
            "/tmp/state_conv_data", records_per_split=4, duration_ms=4000
        )
    )
    restored = load_single(ckpt)
    params, stats = restored["params"], restored["stats"]

    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=4, num_workers=2,
        num_load_file=2, num_steps=32, time_step=16, time_shift=4,
        max_labels=16, seed=123,
    )
    results = {}
    for name, sd in STATE_DTYPES.items():
        model = TinyYolo(
            num_classes=2, in_hw=(240, 304), time_window=16,
            state_dtype=sd,
        )
        trainer = Trainer(
            limit_val_batches=32, out_dir=f"/tmp/state_inf_{name}", seed=123,
        )
        metrics = trainer.validate(model, dm, params, stats)
        results[name] = {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if k in ("map", "map_50", "mar_1", "mar_10", "mar_100")
        }
        print(f"[{name}] {results[name]}", flush=True)

    base = results["f32"]["map_50"]
    print(json.dumps({
        "metric": "state_dtype_inference_map",
        "ckpt": ckpt,
        **results,
        "delta_map50_bf16": round(results["bf16"]["map_50"] - base, 4),
        "delta_map50_fp8": round(results["fp8_e4m3"]["map_50"] - base, 4),
        "delta_map50_e5m2": round(results["fp8_e5m2"]["map_50"] - base, 4),
    }))


if __name__ == "__main__":
    main()
