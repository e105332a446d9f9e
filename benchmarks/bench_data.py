#!/usr/bin/env python3
"""Host data-pipeline benchmark: native C++ vs numpy rasterization.

Measures the event->frame path that feeds the chip (SURVEY.md §7.3
names 1Mpx host throughput as a hard part). Prints one JSON line per
configuration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import tempfile
import time

import numpy as np

from snn_for_object_detection_tpu.data.psee import EventReader, _decode, write_dat
from snn_for_object_detection_tpu.data.rasterize import rasterize
from snn_for_object_detection_tpu.native import (
    is_available,
    rasterize_records_native,
)


def make_events(n, t_max, w, h, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.integers(0, t_max, n)).astype(np.uint32)
    x = rng.integers(0, w, n).astype(np.uint16)
    y = rng.integers(0, h, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    return t, x, y, p


def bench_config(name, h, w, events_per_frame, num_steps=32, reps=20):
    step_us = 16_000
    n = events_per_frame * num_steps
    t, x, y, p = make_events(n, step_us * num_steps, w, h)
    with tempfile.NamedTemporaryFile(suffix="_td.dat") as f:
        write_dat(f.name, t, x, y, p, w, h)
        reader = EventReader(f.name)
        records = np.array(reader.load_delta_t_records(step_us * num_steps))

    # numpy path
    t0 = time.perf_counter()
    for _ in range(reps):
        ev = _decode(records)
        tidx = ev["t"].astype(np.int64) // step_us
        rasterize(ev, tidx, num_steps, h, w)
    np_dt = (time.perf_counter() - t0) / reps

    result = {
        "metric": f"rasterize_{name}",
        "numpy_ms": round(np_dt * 1e3, 2),
        "events": n,
        "numpy_Mev_per_s": round(n / np_dt / 1e6, 1),
    }
    if is_available():
        out = np.zeros((num_steps, h, w, 2), np.float32)
        t0 = time.perf_counter()
        for _ in range(reps):
            rasterize_records_native(records, 0, step_us, num_steps, h, w,
                                     out=out)
        na_dt = (time.perf_counter() - t0) / reps
        result.update(
            native_ms=round(na_dt * 1e3, 2),
            native_Mev_per_s=round(n / na_dt / 1e6, 1),
            speedup=round(np_dt / na_dt, 2),
        )
    print(json.dumps(result))


if __name__ == "__main__":
    bench_config("gen1", 240, 304, events_per_frame=5000)
    bench_config("1mpx", 720, 1280, events_per_frame=30000)
