#!/usr/bin/env python3
"""Report copy/transpose/relayout overhead in the compiled headline step.

VERDICT round-3 item 3 asks to "eliminate remaining relayout/copy
passes" between the measured end-to-end throughput (~25 TFLOP/s) and
the repo's conv-only ceiling (~41 TFLOP/s). This tool makes that gap
inspectable: it compiles the headline inference forward (T=32 GEN1
TinyYolo, bf16 acts+states, AUTO input layout — the exact bench.py
configuration) on the current backend and reports

  - the backend cost-analysis FLOPs and bytes accessed,
  - every `copy`, `transpose`, `bitcast-convert` and fusion-of-copy op
    in the optimized HLO, with the tensor bytes it moves,
  - the fraction of total bytes-accessed attributable to pure data
    movement (the relayout tax).

Run on the real chip:
    python benchmarks/hlo_pass_report.py [--no-auto-layout]

`--no-auto-layout` compiles with default layouts instead, so the two
reports diff the layout tax directly.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HLO_CPU"):
    # sitecustomize imports jax with the axon backend at startup, so
    # the JAX_PLATFORMS env var is too late — switch via config
    # (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.models import TinyYolo

# Headline geometry; HLO_T/HLO_B env overrides let the script's logic
# be sanity-checked on CPU, where the full compile takes >10 min.
T = int(os.environ.get("HLO_T", 32))
B = int(os.environ.get("HLO_B", 16))
H, W = 240, 304

_DTYPE_BYTES = {
    "pred": 0.125, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
    "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string like ``bf16[32,16,240,304,2]``.

    Tuple shapes contribute the sum of their leaves.
    """
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += int(n * _DTYPE_BYTES.get(dtype, 4))
    return total


def main():
    auto_layout = "--no-auto-layout" not in sys.argv

    model = TinyYolo(
        num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
        state_dtype=jnp.bfloat16, remat=False, scan_unroll=2,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1, jnp.uint8
    )

    def forward(params, stats, X):
        (cls_p, box_p), _, _ = model.forward(params, stats, X)
        return cls_p.sum(), box_p.sum()

    if auto_layout:
        try:
            from jax.experimental.layout import Format, Layout

            fwd = jax.jit(
                forward, in_shardings=(None, None, Format(Layout.AUTO))
            )
        except Exception:
            fwd = jax.jit(forward)
    else:
        fwd = jax.jit(forward)
    compiled = fwd.lower(params, stats, X).compile()

    # --- backend cost analysis ------------------------------------------
    cost = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        cost = {
            "flops": ca.get("flops"),
            "bytes_accessed": ca.get("bytes accessed"),
            "hbm_bytes": ca.get("bytes accessed0{}")
            or ca.get("bytes accessedout"),
        }
    except Exception as e:
        cost = {"error": f"{type(e).__name__}: {e}"[:160]}

    # --- optimized-HLO data-movement census -----------------------------
    hlo = compiled.as_text()
    movement = {"copy": 0, "transpose": 0, "bitcast": 0}
    move_bytes = {"copy": 0, "transpose": 0, "bitcast": 0}
    top = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+) (copy|transpose|bitcast-convert)\(",
                     line)
        if not m:
            continue
        kind = {"bitcast-convert": "bitcast"}.get(m.group(2), m.group(2))
        nbytes = shape_bytes(m.group(1))
        movement[kind] += 1
        move_bytes[kind] += nbytes
        top.append((nbytes, kind, m.group(1)))
    top.sort(reverse=True)

    total_move = sum(move_bytes.values())
    report = {
        "metric": "hlo_pass_report",
        "backend": jax.devices()[0].platform,
        "auto_layout": auto_layout,
        "cost_analysis": cost,
        "movement_op_counts": movement,
        "movement_bytes": move_bytes,
        "movement_total_mb": round(total_move / 2**20, 2),
        "top_movement_ops": [
            {"mb": round(b / 2**20, 2), "kind": k, "shape": s}
            for b, k, s in top[:12]
        ],
    }
    ba = cost.get("bytes_accessed")
    if ba:
        report["movement_fraction_of_bytes_accessed"] = round(
            total_move / ba, 4
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
