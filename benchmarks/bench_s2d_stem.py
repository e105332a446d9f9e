#!/usr/bin/env python3
"""Space-to-depth stem (spec.Conv(s2d=True)): where the win lives.

The raw GEN1/1Mpx event frame has Cin=2, so the stage-1 3x3 stride-2
conv contracts only 9*2=18 wide — a fraction of the 128-lane MXU —
and measured ~6x above its bandwidth bound (docs/perf.md). The s2d
plan packs 2x2 spatial blocks into channels and contracts 16*2=32
over a quarter the positions, exact-numerics (tests/test_s2d.py).

Rows:
  1. stage-1 unit in isolation (conv -> eval-BN -> LIF over T, both
     plans) — attributes the win to the stem;
  2. full TinyYolo forward, plain vs s2d_stem (and the deltas at
     1Mpx geometry, where the stem is 720x1280).

Run on the real chip:  python benchmarks/bench_s2d_stem.py [T B]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._util import timeit
from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S


def stem_unit_seconds(H, W, cout, T, B, s2d: bool, dtype=jnp.bfloat16):
    """Seconds per T-step sequence of the stage-1 unit under one plan."""
    blk = C.compile_block(
        [S.Conv(cout, 3, 2, s2d=s2d), S.Norm(), S.LIF()], 2, (H, W)
    )
    params = blk.init(jax.random.PRNGKey(0))
    stats = blk.init_stats()
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1, dtype
    )

    @jax.jit
    def run(params, X):
        def body(state, x):
            y, _, state = blk.apply(params, stats, state, x, C.Ctx())
            return state, y.astype(jnp.float32).sum()

        _, ys = jax.lax.scan(body, blk.init_state(B), X)
        return ys.sum()

    return timeit(run, params, X)


def model_fps(model, params, stats, X):
    @jax.jit
    def fwd(params, X):
        (cls_p, box_p), _, _ = model.forward(params, stats, X)
        return cls_p.sum().astype(jnp.float32)

    dt = timeit(fwd, params, X)
    return X.shape[0] * X.shape[1] / dt


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    # 1. stage-1 unit in isolation, GEN1 geometry
    for name, (H, W) in (("gen1", (240, 304)), ("1mpx", (720, 1280))):
        b_unit = 2 if name == "1mpx" else B
        plain = stem_unit_seconds(H, W, 64, T, b_unit, s2d=False)
        packed = stem_unit_seconds(H, W, 64, T, b_unit, s2d=True)
        print(json.dumps({
            "bench": f"s2d_stem_unit_{name}",
            "T": T, "B": b_unit, "hw": [H, W],
            "plain_ms": round(plain * 1e3, 2),
            "s2d_ms": round(packed * 1e3, 2),
            "speedup": round(plain / packed, 3),
        }), flush=True)

    # 2. full flagship model, both plans (same params)
    kw = dict(num_classes=2, in_hw=(240, 304),
              compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16,
              remat=False, scan_unroll=2)
    m_plain = TinyYolo(**kw)
    m_s2d = TinyYolo(s2d_stem=True, **kw)
    params, stats = m_plain.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, 240, 304, 2)) < 0.1,
        jnp.uint8,
    )
    fps_plain = model_fps(m_plain, params, stats, X)
    fps_s2d = model_fps(m_s2d, params, stats, X)
    print(json.dumps({
        "bench": "s2d_stem_full_model_gen1",
        "T": T, "B": B,
        "plain_frames_per_sec": round(fps_plain, 1),
        "s2d_frames_per_sec": round(fps_s2d, 1),
        "speedup": round(fps_s2d / fps_plain, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
