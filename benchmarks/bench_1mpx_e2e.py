#!/usr/bin/env python3
"""1Mpx end-to-end smoke on the chip: fit + validate + predict.

Round-2 measured 1Mpx per-step forward perf (5.75 ms/frame) but never
drove the FULL pipeline at 1280x720/7-class — anchors, SSD loss, mAP
eval and the plotter all exercise different code than the forward
benchmark. This runs one short fit (synthetic 1Mpx events), a
validation epoch with COCO mAP, and a predict that renders a video,
then prints one JSON line with the step timings and outcomes.
Reference geometry: /root/reference/utils/datasets.py:216-218, 68-76.

Run on the real chip:  python benchmarks/bench_1mpx_e2e.py [steps]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.train import Trainer
from snn_for_object_detection_tpu.utils import Plotter


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    root = make_synthetic_dataset(
        "/tmp/synth_1mpx", dataset="1mpx", records_per_split=2,
        duration_ms=1500, height=720, width=1280, num_classes=7,
    )
    # bf16 compute + states: the documented 1Mpx training configuration
    # (docs/perf.md "1Mpx training readiness") — fp32 states OOM at
    # 720p (21.4G needed vs 15.75G HBM, measured).
    model = TinyYolo(num_classes=7, in_hw=(720, 1280), time_window=4,
                     compute_dtype="bfloat16", state_dtype="bfloat16")
    dm = PropheseeDataModule(
        data_dir=root, dataset="1mpx", batch_size=2, num_workers=2,
        num_load_file=2, num_steps=12, time_step=16, time_shift=4,
        max_labels=32, seed=0,
    )
    out = "/tmp/run_1mpx"
    trainer = Trainer(
        max_epochs=1, limit_train_batches=steps, limit_val_batches=4,
        check_val_every_n_epoch=1, out_dir=out, log_every_n_steps=10,
        save_top_k=1, seed=0, limit_predict_batches=1,
    )
    t0 = time.time()
    result = trainer.fit(model, dm)
    fit_s = time.time() - t0

    t0 = time.time()
    metrics = trainer.validate(
        model, dm, result["params"], result["stats"]
    )
    val_s = time.time() - t0

    plotter = Plotter(save_video=True, show_video=False,
                      file_path="/tmp/run_1mpx_vid")
    t0 = time.time()
    trainer.predict(model, dm, result["params"], result["stats"], plotter)
    pred_s = time.time() - t0
    vids = glob.glob("/tmp/run_1mpx_vid/*.avi")

    print(json.dumps({
        "metric": "1mpx_end_to_end_smoke",
        "geometry": "1280x720, 7 classes, T=12, B=2",
        "fit_steps": steps,
        "fit_s": round(fit_s, 1),
        "val_s": round(val_s, 1),
        "predict_s": round(pred_s, 1),
        "val_map_keys": sorted(
            k for k in metrics if k.startswith(("map", "mar"))
        ),
        "map_50": round(float(metrics.get("map_50", -1)), 4),
        "video_written": bool(vids),
    }))


if __name__ == "__main__":
    main()
