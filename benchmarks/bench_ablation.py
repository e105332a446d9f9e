#!/usr/bin/env python3
"""Where does the B=8 headline forward spend its time? (MFU decomposition)

The round-2 ablation ran at B=16 (docs/perf.md "Where the time goes");
the headline moved to B=8 and best sustained is ~28 TFLOP/s ≈ 14% of
v5e bf16 peak. This decomposes the B=8 forward into its cost layers by
swapping model pieces, all at T=32 GEN1 bf16/bf16:

  convs_relu   LIF/LI -> ReLU (stateless): conv + BN cost only, no
               state traffic, no surrogate/reset chain
  convs_only   additionally Norm -> Pass: bare conv pyramid
  full         the production TinyYolo (spiking)
  no_head      backbone+neck only (head + detection decode excluded,
               via the raw pyramid taps)

Each variant reports ms/forward and effective TFLOP/s from its own
analytic FLOPs (utils/summary), so "what fraction of peak does each
slice reach" is direct, not inferred.

Run on the real chip:  python benchmarks/bench_ablation.py [T B]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.models import TinyYolo
from snn_for_object_detection_tpu.models.spec import (
    LI,
    LIF,
    Norm,
    Pass,
    ReLU,
)

from benchmarks._util import timeit  # noqa: E402  (shared protocol)

# BENCH_HW lets the script's logic be sanity-checked on CPU
H, W = (
    tuple(int(v) for v in os.environ["BENCH_HW"].split("x"))
    if os.environ.get("BENCH_HW") else (240, 304)
)


def _swap(cfg, table):
    """Recursively replace spec leaves per ``table`` (type -> factory)."""
    if isinstance(cfg, list):
        return type(cfg)(_swap(c, table) for c in cfg)
    for src, make in table.items():
        if isinstance(cfg, src):
            return make()
    return cfg


def make_variant(table):
    class Variant(TinyYolo):
        def backbone_cfgs(self):
            return _swap(super().backbone_cfgs(), table)

        def neck_cfgs(self):
            return _swap(super().neck_cfgs(), table)

        def head_cfgs(self, box_out, cls_out):
            return _swap(super().head_cfgs(box_out, cls_out), table)

    return Variant


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.1, jnp.uint8
    )
    kw = dict(
        num_classes=2, in_hw=(H, W),
        compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16,
    )

    variants = {
        "full": TinyYolo,
        "convs_relu": make_variant({LIF: ReLU, LI: ReLU}),
        "convs_only": make_variant({LIF: ReLU, LI: ReLU, Norm: Pass}),
    }

    out = {"metric": "mfu_ablation", "T": T, "B": B, "rows": {}}
    for name, cls in variants.items():
        model = cls(**kw)
        params, stats = model.init(jax.random.PRNGKey(0))
        fwd = jax.jit(
            lambda p, s, x, m=model: m.forward(p, s, x)[0][0].sum()
        )
        dt = timeit(fwd, params, stats, X)
        try:
            from snn_for_object_detection_tpu.utils.summary import summarize

            gflop_frame = summarize(model)["conv_flops_per_frame"] / 1e9
        except Exception:
            gflop_frame = 7.62  # round-2 pinned TinyYolo figure
        row = {
            "ms_per_forward": round(dt * 1e3, 1),
            "frames_per_sec": round(T * B / dt, 1),
            "tflops": round(gflop_frame * T * B / dt / 1e3, 1),
        }
        out["rows"][name] = row
        print(json.dumps({name: row}), flush=True)

    # backbone+neck only: time the pyramid taps without head/decode
    model = TinyYolo(**kw)
    params, stats = model.init(jax.random.PRNGKey(0))

    from snn_for_object_detection_tpu.models import compile as C

    def trunk(p, s, x):
        p = model._cast_weights(p)
        state = model.init_state(x.shape[1])
        ctx = C.Ctx(train=False)

        def body(st, xt):
            feats, _, st2 = model._trunk(p, s, st, xt, ctx)
            return st2, sum(f.astype(jnp.float32).sum() for f in feats)

        st, sums = jax.lax.scan(body, state, x)
        return sums.sum()

    try:
        f = jax.jit(trunk)
        dt = timeit(f, params, stats, X)
        out["rows"]["trunk_no_head"] = {
            "ms_per_forward": round(dt * 1e3, 1),
            "frames_per_sec": round(T * B / dt, 1),
        }
    except Exception as e:
        out["rows"]["trunk_no_head"] = {
            "skipped": f"{type(e).__name__}: {e}"[:200]
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
