#!/usr/bin/env python3
"""Pallas fused conv+BN+LIF kernel vs XLA fusion, on real hardware.

Device time is isolated by chaining REPS invocations inside one jit
(state fed back through a fori_loop) — per-call dispatch over the TPU
tunnel costs ~3.4 ms and would otherwise dominate.

Measured result (v5e, 2026-08): XLA's automatic fusion of
matmul + BN + LIF matches or beats the hand-written kernel on all C2f
shapes, so the production model keeps the XLA path (see
ops/pallas_kernels.py docstring).
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

from snn_for_object_detection_tpu.ops.pallas_kernels import (
    fused_pointwise_conv_bn_lif,
    xla_pointwise_conv_bn_lif,
)

REPS = 50
SHAPES = [  # (N = B*H*W, Cin, Cout): TinyYolo C2f 1x1 convs at B=16
    (16 * 30 * 38, 256, 128),
    (16 * 60 * 76, 128, 64),
    (16 * 120 * 152, 64, 64),
]


def chain(f):
    def run(x, w, a, b, v, i):
        def body(_, carry):
            v, i = carry
            _, v, i = f(x, w, a, b, v, i)
            return v, i

        v, i = jax.lax.fori_loop(0, REPS, body, (v, i))
        return v.sum()

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    for n, cin, cout in SHAPES:
        x = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.05, jnp.bfloat16)
        a = jnp.ones((cout,), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, cout)) * 0.3, jnp.bfloat16)
        i = jnp.asarray(rng.normal(size=(n, cout)) * 0.3, jnp.bfloat16)

        def timeit(f):
            float(f(x, w, a, b, v, i))
            return min(
                (lambda t0: (float(f(x, w, a, b, v, i)), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                / REPS
                for _ in range(3)
            )

        tx = timeit(chain(xla_pointwise_conv_bn_lif))
        tp = timeit(chain(fused_pointwise_conv_bn_lif))
        print(
            json.dumps(
                {
                    "metric": f"fused_1x1_conv_bn_lif_N{n}_C{cin}x{cout}",
                    "xla_us": round(tx * 1e6),
                    "pallas_us": round(tp * 1e6),
                    "xla_over_pallas": round(tx / tp, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
