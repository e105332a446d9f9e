#!/usr/bin/env python3
"""Profile the headline forward and name the top device-time sinks.

VERDICT round-4 item 4: the MFU analysis stopped at data collection
(cost-model census, ablation). This closes the loop with ground truth:
run the exact headline configuration (TinyYolo bf16/bf16, T=32,
`scan_unroll=2`) under ``jax.profiler.trace`` and aggregate the trace's
device-lane events into per-op totals, so "what are the top-3 time
sinks" is answered from the hardware's own timeline instead of
inferred from swap-a-layer ablations.

The trace parser reads the Perfetto/Chrome JSON the profiler writes
(``plugins/profile/<run>/*.trace.json.gz``) directly — no TensorBoard
needed. Device lanes are identified by their process name ("/device:"
or "TPU"); events are keyed by the HLO op name before the fusion
suffix so repeated scan iterations accumulate.

Usage:  python benchmarks/profile_forward.py [T B]
        BENCH_HW=48x64 for CPU smoke runs.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile

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
REPS = int(os.environ.get("BENCH_REPS", "20"))

# Strip fusion/iteration suffixes so per-op rows aggregate:
#   "fusion.123" -> "fusion", "%convolution.42" -> "convolution"
_BASE = re.compile(r"^%?([a-zA-Z_][\w-]*?)[._]\d*$")


def base_name(name: str) -> str:
    m = _BASE.match(name)
    return m.group(1) if m else name


def load_trace_events(trace_dir: str):
    """Yield (pid_name, event) for every complete event in the trace."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        pids = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pids[ev["pid"]] = ev.get("args", {}).get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                yield pids.get(ev.get("pid"), ""), ev


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    model = TinyYolo(
        num_classes=2, in_hw=(H, W),
        compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16,
        scan_unroll=2,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1, jnp.uint8
    )
    fwd = jax.jit(lambda p, s, x: model.forward(p, s, x)[0][0].sum())

    dt = timeit(fwd, params, stats, X)  # warm + baseline timing

    trace_dir = tempfile.mkdtemp(prefix="snn_profile_")
    with jax.profiler.trace(trace_dir):
        for _ in range(REPS):
            out = fwd(params, stats, X)
        float(out)

    # ---- aggregate device-lane ops ----
    per_op: dict = {}
    device_total = 0.0
    lanes = set()
    for pname, ev in load_trace_events(trace_dir):
        lanes.add(pname)
        if "/device:" not in pname and "TPU" not in pname.upper():
            continue
        if pname.endswith("#Steps#") or ev.get("name", "").startswith("$"):
            continue
        dur = ev["dur"]  # microseconds
        key = base_name(ev.get("name", "?"))
        per_op[key] = per_op.get(key, 0.0) + dur
        device_total += dur

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    wall_us = dt * 1e6 * REPS
    out = {
        "metric": "forward_profile",
        "T": T, "B": B, "reps": REPS,
        "ms_per_forward_wall": round(dt * 1e3, 2),
        "frames_per_sec": round(T * B / dt, 1),
        "device_busy_ms_per_forward": round(device_total / REPS / 1e3, 2),
        "device_busy_fraction_of_wall": round(device_total / wall_us, 3)
        if wall_us else None,
        "top_ops_ms_per_forward": [
            {"op": k, "ms": round(v / REPS / 1e3, 3),
             "pct_of_device": round(100 * v / device_total, 1)
             if device_total else None}
            for k, v in rows
        ],
        "trace_dir": trace_dir,
        "lanes_seen": sorted(lanes)[:12],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
