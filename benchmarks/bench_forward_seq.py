#!/usr/bin/env python3
"""Full-model inference schedules head-to-head on the flagship TinyYolo:

  step   — ``forward``: one lax.scan over T, per-step layer chain
           (the production default; XLA fuses cells into conv epilogues)
  seq    — ``forward_seq``: time-batched convs (T*B folded), per-layer
           temporal cell kernels
  fused  — ``forward_seq`` + ``fuse_seq=True``: [conv -> BN -> cell]
           units routed through the fused temporal Pallas kernels
           (3x3 s1 / 3x3 s2 / 1x1 variants, state resident in VMEM)

Reports frames/s for each at the benchmark geometry (T=32, B=16, GEN1),
bf16 compute + bf16 states. The round-2 finding this retests: the
seq path lost ~17% to layout copies and the nb=1 fused kernel was at
parity; the round-3 kernel rework (tap accumulation, multi-image
blocks, full conv menu) attacks both.

Run on the real chip:  python benchmarks/bench_forward_seq.py [T B]
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

H, W = 240, 304


from benchmarks._util import timeit  # noqa: E402  (shared protocol)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1, jnp.uint8
    )

    def build(fuse):
        return TinyYolo(
            num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
            state_dtype=jnp.bfloat16, remat=False, scan_unroll=2,
            fuse_seq=fuse,
        )

    m = build(False)
    mf = build(True)
    params, stats = m.init(jax.random.PRNGKey(0))

    runs = {
        "step": jax.jit(
            lambda p, s, x: m.forward(p, s, x)[0][0].sum()
        ),
        "seq": jax.jit(
            lambda p, s, x: m.forward_seq(p, s, x)[0][0].sum()
        ),
        "fused": jax.jit(
            lambda p, s, x: mf.forward_seq(p, s, x)[0][0].sum()
        ),
    }
    out = {}
    for name, fn in runs.items():
        try:
            dt = timeit(fn, params, stats, X)
            out[name] = {
                "ms": round(dt * 1e3, 2),
                "frames_per_sec": round(T * B / dt, 1),
            }
        except Exception as e:  # honest failure report per schedule
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"[{name}] {out[name]}", flush=True)

    print(json.dumps({
        "metric": "tiny_yolo_schedules_T%d_B%d" % (T, B),
        **out,
    }))


if __name__ == "__main__":
    main()
