#!/usr/bin/env python3
"""bf16-state training convergence head-to-head (ROADMAP validation).

Trains the flagship TinyYolo twice from identical init on the synthetic
event stream — fp32 neuron-state storage vs bf16 — with the reference
training geometry (T=32, B=4, random-start window 16), then compares
loss trajectories and synthetic-val mAP. Answers the question the
bf16-state speedup (1.8x, docs/perf.md) leaves open: do the training
dynamics track at a few hundred steps, not just 60?

Run from the repo root (long: ~30 min on one v5e chip):
    python benchmarks/bench_state_convergence.py [steps_per_epoch epochs]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.train import Trainer


def run(root: str, name: str, state_dtype, steps_per_epoch: int,
        epochs: int, seed: int = 0, val_every: int = 1) -> dict:
    model = TinyYolo(
        num_classes=2, in_hw=(240, 304), time_window=16,
        state_dtype=state_dtype,
    )
    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=4, num_workers=2,
        num_load_file=2, num_steps=32, time_step=16, time_shift=4,
        max_labels=16, seed=seed,
    )
    out = f"/tmp/state_conv_{name}_s{seed}"
    trainer = Trainer(
        max_epochs=epochs, limit_train_batches=steps_per_epoch,
        limit_val_batches=16, check_val_every_n_epoch=val_every,
        out_dir=out, log_every_n_steps=20, save_top_k=1, seed=seed,
    )
    trainer.fit(model, dm, ckpt_path="auto")  # supervisor-restartable
    rows = []
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return {
        "loss": [
            (r["step"], r["epoch_train_loss"])
            for r in rows if "epoch_train_loss" in r
        ],
        "map50": [
            (r["step"], r["map_50"]) for r in rows if "map_50" in r
        ],
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    only = sys.argv[3] if len(sys.argv) > 3 else None  # f32|bf16|e5m2
    # comma list also accepted ("bf16,e5m2" = the round-5 fp8-train
    # head-to-head; e5m2 states measured 1.17x bf16 train throughput,
    # log/chip_r05/train_sched_e5m2.log — this answers whether the
    # dynamics track)
    seeds = (
        [int(s) for s in sys.argv[4].split(",")]
        if len(sys.argv) > 4 else [0]
    )
    val_every = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    root = make_synthetic_dataset(
        "/tmp/state_conv_data", records_per_split=4, duration_ms=4000
    )
    configs = [("f32", jnp.float32), ("bf16", jnp.bfloat16),
               ("e5m2", jnp.float8_e5m2)]
    if only:
        wanted = only.split(",")
        configs = [c for c in configs if c[0] in wanted]
    results = {}
    for seed in seeds:
        for name, sd in configs:
            key = f"{name}_s{seed}"
            results[key] = run(root, name, sd, steps, epochs,
                               seed=seed, val_every=val_every)
            print(f"[{key}] loss: {results[key]['loss']}", flush=True)
            print(f"[{key}] map50: {results[key]['map50']}", flush=True)
    print(json.dumps({
        "metric": "bf16_state_convergence_headtohead",
        "steps": steps * epochs,
        "seeds": seeds,
        **results,
    }))


if __name__ == "__main__":
    main()
