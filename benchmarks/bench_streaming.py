#!/usr/bin/env python3
"""Streaming single-frame inference latency (the SNN deployment story:
O(1) per-frame, no sliding-window reprocessing; soda.py:202-233).

Measures the jitted ``predict`` step (one frame through the stateful
network + detection decode) at batch 1. The tunnel's ~3.4 ms dispatch
RTT is reported separately from device time (chained execution).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.models import TinyYolo

H, W = 240, 304
CHAIN = 32


def bench_engine(model, params, stats, S: int = 32) -> dict:
    """End-to-end StreamingEngine step time: sync vs pipelined, and
    fp32 vs uint8 host staging, at full capacity (S streams)."""
    from snn_for_object_detection_tpu.serve import StreamingEngine

    rng = np.random.default_rng(2)
    # host-side uint8 event frames, as a rasterizer would hand over
    frame_seq = [
        {f"cam{i}": (rng.random((H, W, 2)) < 0.1).astype(np.uint8)
         for i in range(S)}
        for _ in range(8)
    ]
    out = {}
    for name, kwargs in (
        ("engine_fp32_sync", dict(frame_dtype="float32")),
        ("engine_uint8_sync", dict()),
        ("engine_uint8_pipelined", dict(pipelined=True)),
    ):
        eng = StreamingEngine(model, params, stats, capacity=S, **kwargs)
        for i in range(S):
            eng.add_stream(f"cam{i}")
        for f in frame_seq[:2]:  # compile + warm
            eng.step(f)
        reps, t0 = 0, time.perf_counter()
        while True:
            eng.step(frame_seq[reps % len(frame_seq)])
            reps += 1
            dt = time.perf_counter() - t0
            if reps >= 30 and dt >= 3.0:
                break
        eng.flush()
        per_step = dt / reps
        out[f"{name}_ms_per_step"] = round(per_step * 1e3, 2)
        out[f"{name}_realtime_cameras"] = int(S * 0.016 / per_step)
    return out


def main():
    model = TinyYolo(
        num_classes=2, in_hw=(H, W),
        compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16, remat=False,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    state0 = model.init_state(1)
    frames = jnp.asarray(
        np.random.default_rng(0).random((CHAIN, 1, H, W, 2)) < 0.1, jnp.uint8
    )

    # device time: CHAIN frames chained in one dispatch
    def run_chain(params, stats, frames, state):
        def body(state, x):
            dets, state = model.predict(params, stats, x, state)
            return state, dets[..., 1].sum()
        state, sums = jax.lax.scan(body, state, frames)
        return sums.sum()

    chained = jax.jit(run_chain)
    float(chained(params, stats, frames, state0))  # compile
    t0 = time.perf_counter()
    float(chained(params, stats, frames, state0))
    per_frame_device = (time.perf_counter() - t0) / CHAIN

    # end-to-end: one dispatch per frame (includes tunnel RTT)
    predict = jax.jit(lambda p, s, x, st: model.predict(p, s, x, st))
    dets, state = predict(params, stats, frames[0], state0)
    float(dets[..., 1].sum())  # host fetch = reliable sync on the tunnel
    t0 = time.perf_counter()
    state = state0
    for t in range(CHAIN):
        dets, state = predict(params, stats, frames[t], state)
    float(dets[..., 1].sum())
    per_frame_e2e = (time.perf_counter() - t0) / CHAIN

    # whole-network B=1 megakernel (ops/megakernel.py): the whole net
    # emitted as one program per frame (folded BN, flat state slots).
    # Production mode is the XLA body — the monolithic Pallas mode
    # cannot express the stride-2 downsamples on current Mosaic
    # (strided slices lower to >2D gathers, and every reshape-based
    # phase split crashes the compiler at frame scale; docs/perf.md
    # "B=1 streaming megakernel").
    mega = {}
    try:
        from snn_for_object_detection_tpu.ops.megakernel import (
            StreamingMegakernel,
        )

        mk = StreamingMegakernel(model, params, stats, use_pallas=False)
        st = None
        dets, st = mk.predict(frames[0, 0], st)   # compile
        float(dets[..., 1].sum())  # host fetch = reliable sync
        t0 = time.perf_counter()
        st = None
        for t in range(CHAIN):
            dets, st = mk.predict(frames[t, 0], st)
        float(dets[..., 1].sum())
        mega["megakernel_e2e_ms"] = round(
            (time.perf_counter() - t0) / CHAIN * 1e3, 2
        )

        # device time: chain the per-frame program in one dispatch
        def mk_chain(frames, sv):
            def body(sv, x):
                dets, sv = mk._predict_impl(x, sv, 300)
                return sv, dets[..., 1].sum()
            sv, sums = jax.lax.scan(body, sv, frames[:, 0])
            return sums.sum()

        mk_chained = jax.jit(mk_chain)
        sv0 = mk._flat_state(None)
        float(mk_chained(frames, sv0))  # compile
        t0 = time.perf_counter()
        float(mk_chained(frames, sv0))
        mega["megakernel_device_ms"] = round(
            (time.perf_counter() - t0) / CHAIN * 1e3, 2
        )
    except Exception as e:
        mega["megakernel_error"] = f"{type(e).__name__}: {e}"[:200]

    # multi-camera serving: S independent streams share one chip; the
    # batch axis amortizes weight reads + dispatch (production serving
    # geometry — each stream keeps its own O(1) state slice)
    serving = {}
    for S in (8, 32):
        stateS = model.init_state(S)
        framesS = jnp.asarray(
            np.random.default_rng(1).random((CHAIN, S, H, W, 2)) < 0.1,
            jnp.uint8,
        )
        float(chained(params, stats, framesS, stateS))  # compile
        t0 = time.perf_counter()
        float(chained(params, stats, framesS, stateS))
        dt = (time.perf_counter() - t0) / CHAIN
        serving[f"streams_{S}_ms_per_frame"] = round(dt * 1e3, 2)
        serving[f"streams_{S}_realtime_cameras"] = int(S * 0.016 / dt)

    # the FULL StreamingEngine (serve.py) — host staging + H2D + step +
    # per-stream fan-out, i.e. what a deployment actually pays. uint8
    # staging ships 4x less H2D than the pre-round-4 fp32 buffers;
    # pipelined mode overlaps the device step with the next host batch.
    serving.update(bench_engine(model, params, stats))

    print(
        json.dumps(
            {
                "metric": "gen1_streaming_latency_per_frame",
                "device_ms": round(per_frame_device * 1e3, 2),
                "end_to_end_ms": round(per_frame_e2e * 1e3, 2),
                "unit": "ms/frame (batch 1, incl. NMS decode)",
                "realtime_budget_ms": 16,
                **mega,
                **serving,
            }
        )
    )


if __name__ == "__main__":
    main()
