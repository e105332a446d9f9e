#!/usr/bin/env python3
"""Per-unit head-to-head: fused temporal Pallas ``spiking_conv_seq``
vs the XLA alternative (lax.scan of conv -> eval-BN -> cell) at every
spiking-conv unit shape of the flagship TinyYolo (B=16, T=32, GEN1).

This decomposes the full-model ``fuse_seq`` number: each row shows the
kernel's own time against what XLA produces for the identical unit, so
glue costs (slab pre-gather, phase pre-split) are attributed per shape.

Run on the real chip:  python benchmarks/bench_conv_seq_units.py [T B]
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

from snn_for_object_detection_tpu.ops import neurons
from snn_for_object_detection_tpu.ops.pallas_kernels import spiking_conv_seq

# (name, H, W, cin, cout, k, stride) — every fused-eligible unit shape
# in TinyYolo at GEN1 240x304 (stage downsamples, C2f bottlenecks, head
# stem); xN = how many instances the model runs per step.
UNITS = [
    ("s1.down  x1", 240, 304, 2, 64, 3, 2),
    ("s1.btl   x2", 120, 152, 32, 32, 3, 1),
    ("s2.down  x1", 120, 152, 64, 128, 3, 2),
    ("s2.btl   x3", 60, 76, 64, 64, 3, 1),
    ("s3.down  x1", 60, 76, 128, 256, 3, 2),
    ("s3.btl   x4", 30, 38, 128, 128, 3, 1),
    ("s4.down  x1", 30, 38, 256, 256, 3, 2),
    ("s4.btl   x3", 15, 19, 128, 128, 3, 1),
    ("s5.down  x1", 15, 19, 256, 256, 3, 2),
    ("s5.btl   x2", 8, 10, 128, 128, 3, 1),
    ("head.stem x3", 30, 38, 256, 256, 1, 1),
]


from benchmarks._util import timeit  # noqa: E402  (shared protocol)


def xla_unit(x_seq, w, a, b, v0, i0, cell, stride):
    pad = [(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0), (0, 0)]
    if cell == "lif":
        cfn, mk = neurons.lif_step, neurons.LIFState
    else:
        cfn, mk = neurons.li_step, neurons.LIState

    def step(state, x):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * a + b
        z, state = cfn(y.astype(state.v.dtype), state)
        return state, z

    _, zs = jax.lax.scan(step, mk(v0, i0), x_seq)
    return zs


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    rows = []
    for name, H, W, cin, cout, k, stride in UNITS:
        # torch conv geometry: same-pad for k=3, none for k=1 — both
        # give out = (H-1)//stride + 1
        ho, wo = (H - 1) // stride + 1, (W - 1) // stride + 1
        x = jnp.asarray(rng.random((T, B, H, W, cin)) < 0.2, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.1,
                        jnp.bfloat16)
        a = jnp.asarray(rng.random(cout) + 0.5, jnp.float32)
        b = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)
        v0 = jnp.zeros((B, ho, wo, cout), jnp.bfloat16)
        i0 = jnp.zeros((B, ho, wo, cout), jnp.bfloat16)
        cell = "li" if "head" in name else "lif"
        fused = jax.jit(
            lambda x, w, a, b, v, i, _c=cell, _s=stride:
            spiking_conv_seq(x, w, a, b, v, i, cell=_c, stride=_s)[0].sum()
        )
        ref = jax.jit(
            lambda x, w, a, b, v, i, _c=cell, _s=stride:
            xla_unit(x, w, a, b, v, i, _c, _s).sum()
        )
        row = {"unit": name.split()[0], "shape": f"{H}x{W}x{cin}->{cout}"}
        try:
            row["fused_ms"] = round(
                timeit(fused, x, w, a, b, v0, i0) * 1e3, 2)
        except Exception as e:
            row["fused_ms"] = f"{type(e).__name__}"[:60]
        row["xla_ms"] = round(timeit(ref, x, w, a, b, v0, i0) * 1e3, 2)
        print(row, flush=True)
        rows.append(row)
    print(json.dumps({"metric": "conv_seq_units_T%d_B%d" % (T, B),
                      "rows": rows}))


if __name__ == "__main__":
    main()
