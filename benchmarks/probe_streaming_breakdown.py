#!/usr/bin/env python3
"""Where does a StreamingEngine step actually spend its time?

Round-4 chip queue (log/chip_r04b/streaming.log): the engine's
``pipelined=True`` double-buffer measured SLOWER than sync (183.3 vs
151.3 ms/step at S=32) — the opposite of its rationale. Both are ~11x
the 13.2 ms device time of the same 32-stream chained step, so ~90% of
a step is host/transfer overhead that the double-buffer was supposed to
hide. This probe breaks one step into phases, for sync and pipelined:

  stage    host staging: buf[:] = 0 + per-slot row fill
  xfer     jnp.asarray(buf)  (host->device staging of the slot batch)
  dispatch jitted step call returning device handles
  fetch    np.asarray(dets)  (device->host result readback, blocks)
  fanout   per-stream filter_detections on host

and then measures candidate fixes at the whole-step level:

  nozero   skip the full-buffer zero when every slot is written anyway
  prefetch pipelined, but fetch the previous step's dets BEFORE
           dispatching the next one (readback can't queue behind the
           next upload on a serialized transport)

Usage:  python benchmarks/probe_streaming_breakdown.py [S]
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

from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.ops.nms import filter_detections

H, W = 240, 304
REPS = int(os.environ.get("BENCH_REPS", "30"))


def make(S):
    model = TinyYolo(
        num_classes=2, in_hw=(H, W),
        compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16, remat=False,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    state = model.init_state(S)
    step = jax.jit(
        lambda p, s, f, st: model.predict(p, s, f, st, max_out=300),
        donate_argnums=(3,),
    )
    rng = np.random.default_rng(2)
    frames = [
        [(rng.random((H, W, 2)) < 0.1).astype(np.uint8) for _ in range(S)]
        for _ in range(8)
    ]
    return model, params, stats, state, step, frames


def timed_phases(params, stats, state, step, frames, S) -> dict:
    """Sync step with per-phase wall timing."""
    buf = np.zeros((S, H, W, 2), np.uint8)
    acc = {k: 0.0 for k in ("stage", "xfer", "dispatch", "fetch", "fanout")}
    # warm
    for f in frames[:2]:
        buf[:] = 0
        for i in range(S):
            buf[i] = f[i]
        dets, state = step(params, stats, jnp.asarray(buf), state)
        np.asarray(dets)
    t_all = time.perf_counter()
    for r in range(REPS):
        f = frames[r % len(frames)]
        t0 = time.perf_counter()
        buf[:] = 0
        for i in range(S):
            buf[i] = f[i]
        t1 = time.perf_counter()
        dev = jnp.asarray(buf)
        jax.block_until_ready(dev)
        t2 = time.perf_counter()
        dets, state = step(params, stats, dev, state)
        t3 = time.perf_counter()
        dets_np = np.asarray(dets)
        t4 = time.perf_counter()
        for i in range(S):
            filter_detections(dets_np[i])
        t5 = time.perf_counter()
        acc["stage"] += t1 - t0
        acc["xfer"] += t2 - t1
        acc["dispatch"] += t3 - t2
        acc["fetch"] += t4 - t3
        acc["fanout"] += t5 - t4
    total = time.perf_counter() - t_all
    out = {k: round(v / REPS * 1e3, 2) for k, v in acc.items()}
    out["total_ms"] = round(total / REPS * 1e3, 2)
    return out, state


def run_engine(model, params, stats, frames_dicts, S, **kwargs) -> float:
    from snn_for_object_detection_tpu.serve import StreamingEngine

    eng = StreamingEngine(model, params, stats, capacity=S, **kwargs)
    for i in range(S):
        eng.add_stream(f"cam{i}")
    for f in frames_dicts[:2]:
        eng.step(f)
    t0 = time.perf_counter()
    for r in range(REPS):
        eng.step(frames_dicts[r % len(frames_dicts)])
    eng.flush()
    return round((time.perf_counter() - t0) / REPS * 1e3, 2)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model, params, stats, state, step, frames = make(S)
    frames_dicts = [
        {f"cam{i}": fs[i] for i in range(S)} for fs in frames
    ]

    phases, _ = timed_phases(params, stats, state, step, frames, S)
    out = {"metric": "streaming_step_breakdown", "S": S, "phases": phases}

    out["engine_sync_ms"] = run_engine(
        model, params, stats, frames_dicts, S)
    out["engine_pipelined_ms"] = run_engine(
        model, params, stats, frames_dicts, S, pipelined=True)

    # candidate: skip the full zero when all slots get written
    buf = np.zeros((S, H, W, 2), np.uint8)
    t0 = time.perf_counter()
    for _ in range(REPS):
        buf[:] = 0
    out["zero_only_ms"] = round((time.perf_counter() - t0) / REPS * 1e3, 2)

    # candidate: fetch-before-dispatch pipelining (manual, no engine)
    st = model.init_state(S)
    pending = None
    for f in frames[:2]:  # warm
        buf[:] = 0
        for i in range(S):
            buf[i] = f[i]
        dets, st = step(params, stats, jnp.asarray(buf), st)
        np.asarray(dets)
    t0 = time.perf_counter()
    for r in range(REPS):
        f = frames[r % len(frames)]
        for i in range(S):
            buf[i] = f[i]
        if pending is not None:
            dets_np = np.asarray(pending)   # fetch PREV before dispatch
            for i in range(S):
                filter_detections(dets_np[i])
        dets, st = step(params, stats, jnp.asarray(buf), st)
        pending = dets
    np.asarray(pending)
    out["prefetch_pipelined_ms"] = round(
        (time.perf_counter() - t0) / REPS * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
