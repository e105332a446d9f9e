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


def test_export_stablehlo_cli(tmp_path):
    """End-to-end: checkpoint + config -> portable blob -> served with
    load_predict (no model code in the serving step)."""
    import jax
    import yaml

    from snn_for_object_detection_tpu.export import load_predict
    from snn_for_object_detection_tpu.train.checkpoint import save_single
    from tests.test_detector import MicroSODa

    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    save_single(ckpt, {"params": params, "stats": stats})
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump({"model": {
            "class_path": "tests.test_detector.MicroSODa",
            "init_args": {"num_classes": 2, "in_hw": [32, 40],
                          "time_window": 0},
        }}, f)
    blob = str(tmp_path / "predict.stablehlo")
    out = subprocess.run(
        [sys.executable, "scripts/export_stablehlo.py", ckpt, blob,
         "--config", cfg],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    runner = load_predict(blob)
    x = (np.random.default_rng(0).random((2, 32, 40, 2)) < 0.25
         ).astype(np.uint8)
    dets = runner(x)
    assert dets.shape == (2, 300, 6)
    assert np.isfinite(np.asarray(dets)).all()


def test_check_gen1_pass_and_fail(tmp_path):
    """Dataset preflight (scripts/check_gen1.py): a valid synthetic
    GEN1 layout passes; an orphan label and a truncated .dat fail with
    named problems."""
    from snn_for_object_detection_tpu.data.synthetic import (
        make_synthetic_dataset,
    )

    root = make_synthetic_dataset(
        str(tmp_path / "ds"), records_per_split=1, duration_ms=1200
    )
    cmd = [sys.executable, "scripts/check_gen1.py", root]
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr[-500:]
    assert "OK" in out.stdout

    # orphan label (no paired .dat) + truncated event file
    orphan = os.path.join(root, "gen1", "train", "orphan_bbox.npy")
    with open(os.path.join(root, "gen1", "train", "rec0_bbox.npy"),
              "rb") as f:
        data = f.read()
    with open(orphan, "wb") as f:
        f.write(data)
    dat = os.path.join(root, "gen1", "val", "rec0_td.dat")
    with open(dat, "r+b") as f:
        f.truncate(40)
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 1
    assert "label without events" in out.stdout
    assert "zero events" in out.stdout


def test_summarize_chip_queue(tmp_path):
    """Queue-log summarizer: single-line AND indented multi-line JSON
    records surface in the report; failed runs show rc + error tail."""
    q = tmp_path / "q"
    q.mkdir()
    (q / "queue.log").write_text(
        "=== bench ===\nbench rc=0\nhlo_auto rc=0\nint8_ptq rc=124\n"
    )
    (q / "bench.log").write_text(
        'warmup noise\n{"metric": "fps", "value": 3304.3}\n'
    )
    (q / "hlo_auto.log").write_text(
        'head\n{\n  "passes": {"copy": 3},\n  "layout": "auto"\n}\n'
    )
    (q / "int8_ptq.log").write_text("Traceback\nRuntimeError: down\n")

    out = subprocess.run(
        [sys.executable, "scripts/summarize_chip_queue.py", str(q)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "| bench | ok | 1 |" in out.stdout
    assert "| hlo_auto | ok | 1 |" in out.stdout  # multi-line JSON parsed
    assert "| int8_ptq | **rc=124** | 0 |" in out.stdout
    assert '"value": 3304.3' in out.stdout
    assert '"copy": 3' in out.stdout
    assert "RuntimeError: down" in out.stdout


def test_summarize_survives_truncated_json(tmp_path):
    """A benchmark killed mid-print leaves an unbalanced JSON block;
    later records in the same log must still surface."""
    q = tmp_path / "q"
    q.mkdir()
    (q / "queue.log").write_text("late rc=0\n")
    (q / "late.log").write_text(
        '{\n  "truncated": {\n'        # never balances
        + "noise\n" * 500
        + '{"metric": "fps", "value": 7.0}\n'
    )
    out = subprocess.run(
        [sys.executable, "scripts/summarize_chip_queue.py", str(q)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-300:]
    assert '"value": 7.0' in out.stdout
