"""CLI script coverage: model export (optimizer stripping) and
training-curve rendering."""

import json
import os
import subprocess
import sys

import numpy as np


def test_export_model_strips_optimizer(tmp_path):
    from snn_for_object_detection_tpu.train.checkpoint import (
        load_single,
        save_single,
    )

    src = str(tmp_path / "ckpt")
    save_single(src, {
        "params": {"w": np.ones(4)},
        "stats": {"mean": np.zeros(4)},
        "opt_state": [np.zeros(4), {"m": np.ones(4)}],
        "step": 7,
        "epoch": 2,
        "best_metric": 0.3,
    })
    dst = str(tmp_path / "export")
    out = subprocess.run(
        [sys.executable, "scripts/export_model.py", src, dst],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    slim = load_single(dst)
    assert sorted(slim.keys()) == ["epoch", "params", "stats", "step"]
    assert slim["params"]["w"][0] == 1.0 and int(slim["step"]) == 7


def test_plot_metrics_renders_png(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        for step in (10, 20, 30):
            f.write(json.dumps({
                "step": step, "epoch_train_loss": 1.0 / step,
            }) + "\n")
            f.write(json.dumps({"step": step, "map_50": step / 100}) + "\n")
    out = subprocess.run(
        [sys.executable, "scripts/plot_metrics.py", str(run)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    png = run / "training_graph.png"
    assert png.exists() and png.stat().st_size > 0
