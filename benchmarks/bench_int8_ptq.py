#!/usr/bin/env python3
"""int8 post-training quantization: speed AND task-level accuracy.

Calibrates the trained synthetic TinyYolo checkpoint on the synthetic
val stream, quantizes every conv (ops/quantize.py), then measures

  1. inference throughput at the benchmark geometry (T=32, B=16,
     bf16 activations) — int8 convs vs the bf16 baseline, and
  2. synthetic-val mAP@0.5 with quantized vs fp weights (the same
     harness as bench_state_inference_map.py; reference mAP key set:
     /root/reference/models/soda.py:283-292).

Run on the real chip:
    python benchmarks/bench_int8_ptq.py [ckpt_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.ops import quantize as Q
from snn_for_object_detection_tpu.train import Trainer
from snn_for_object_detection_tpu.train.checkpoint import load_single

H, W = 240, 304


from benchmarks._util import timeit  # noqa: E402  (shared protocol)


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "nets/tiny_yolo_synth/model"
    restored = load_single(ckpt)
    params, stats = restored["params"], restored["stats"]

    root = make_synthetic_dataset(
        "/tmp/int8_ptq_data", records_per_split=4, duration_ms=4000
    )
    # model + data geometry mirror the checkpoint's training config
    # (nets/tiny_yolo_synth/config.yaml) so the fp baseline is the
    # checkpoint's real operating point
    model = TinyYolo(
        num_classes=2, in_hw=(H, W), time_window=4,
        compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16,
    )

    # --- calibrate on a few val sequences ---
    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=4, num_workers=2,
        num_load_file=4, num_steps=12, time_step=16, time_shift=6,
        one_label=True, max_labels=64, seed=123,
    )
    loader = dm.val_loader()
    seqs = []
    for i, batch in enumerate(loader):
        if i >= 2:
            break
        seqs.append(jnp.asarray(batch[0]))
    if hasattr(loader, "close"):
        loader.close()
    t0 = time.time()
    absmax = Q.calibrate(model, params, stats, seqs)
    calib_s = time.time() - t0
    qparams = Q.quantize(params, absmax)
    n_q = sum(1 for p in absmax.values() if p > 0)

    # --- throughput: T=32 B=16 forward ---
    X = jnp.asarray(
        np.random.default_rng(0).random((32, 16, H, W, 2)) < 0.1, jnp.uint8
    )
    fwd = jax.jit(lambda p, s, x: model.forward(p, s, x)[0][0].sum())
    dt_fp = timeit(fwd, params, stats, X)
    dt_q = timeit(fwd, qparams, stats, X)

    # --- task-level mAP ---
    results = {}
    for name, p in (("bf16", params), ("int8", qparams)):
        trainer = Trainer(
            limit_val_batches=32, out_dir=f"/tmp/int8_ptq_{name}", seed=123,
        )
        metrics = trainer.validate(model, dm, p, stats)
        results[name] = {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if k in ("map", "map_50", "mar_1", "mar_10", "mar_100")
        }
        print(f"[{name}] {results[name]}", flush=True)

    print(json.dumps({
        "metric": "int8_ptq",
        "quantized_convs": n_q,
        "calibrate_s": round(calib_s, 1),
        "fp_frames_per_sec": round(32 * 16 / dt_fp, 1),
        "int8_frames_per_sec": round(32 * 16 / dt_q, 1),
        "speedup": round(dt_fp / dt_q, 3),
        "map_50_bf16": results["bf16"]["map_50"],
        "map_50_int8": results["int8"]["map_50"],
        "map_50_delta": round(
            results["int8"]["map_50"] - results["bf16"]["map_50"], 4
        ),
    }))


if __name__ == "__main__":
    main()
