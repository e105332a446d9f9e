#!/usr/bin/env python3
"""1Mpx TRAIN-step state-traffic study (ROADMAP round-4 item).

The 1Mpx train step (T=16, B=2, bf16 states) measured 3.76 s/step in
round 3 — HBM-bound on the 720p stage-1 LIF state tensors, with fp32
states OOMing outright. This sweep isolates the state-traffic knobs on
the REAL jitted train step (forward + SSD loss + BPTT grad + Adamax
update), one variant per line:

  - state dtype: bf16 (baseline) / fp8_e4m3 (halves state bytes again)
  - remat on/off (remat reads the states twice; off trades HBM
    capacity for one read)
  - scan_unroll 1/2 (unrolling lets XLA overlap step t's conv with
    step t+1's state update)
  - schedule: per-step scan (baseline) vs time-batched forward_seq
    (convs folded over T*B, Pallas temporal cells with VMEM-resident
    state, conv->norm->cell segments rematerialized) — the
    Trainer(time_batched=True) fast path, VERDICT round-3 item 6

Run on the real chip:
    python benchmarks/bench_1mpx_train.py [T] [B]
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
import optax

from snn_for_object_detection_tpu.models import TinyYolo

H, W = 720, 1280
NUM_CLASSES = 7


def make_step(model, time_batched=False):
    optimizer = optax.adamax(model.learning_rate)
    fwd = model.forward_fn(time_batched)

    def train_step(params, opt_state, stats, X, labels, key):
        r = jax.random.randint(key, (), 0, max(model.time_window, 1))

        def loss_fn(p, stats):
            preds, new_stats, _ = fwd(
                p, stats, X, start_step=r, train=True
            )
            return model.loss(preds, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    return optimizer, train_step


def measure(T, B, time_batched=False, **model_kwargs) -> dict:
    model = TinyYolo(
        num_classes=NUM_CLASSES, in_hw=(H, W), time_window=4,
        compute_dtype=jnp.bfloat16, **model_kwargs,
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    optimizer, train_step = make_step(model, time_batched)
    opt_state = optimizer.init(params)
    X = jnp.asarray(
        np.random.default_rng(0).random((T, B, H, W, 2)) < 0.05, jnp.uint8
    )
    labels = np.full((B, 8, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels = jnp.asarray(labels)
    jit_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, stats, loss = jit_step(
        params, opt_state, stats, X, labels, key
    )
    float(loss)
    compile_s = time.perf_counter() - t0

    # min over windows: immune to the tunnel's intermittent RPC
    # stalls (benchmarks/_util.py docstring)
    dt = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, stats, loss = jit_step(
            params, opt_state, stats, X, labels,
            jax.random.fold_in(key, i),
        )
        float(loss)
        dt = min(dt, time.perf_counter() - t0)
    return {
        "s_per_step": round(dt, 3),
        "frames_per_sec": round(T * B / dt, 1),
        "compile_s": round(compile_s, 1),
        "loss_finite": bool(np.isfinite(float(loss))),
    }


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = {
        "bf16_states_remat_u1": dict(state_dtype=jnp.bfloat16),
        "bf16_states_remat_u2": dict(state_dtype=jnp.bfloat16,
                                     scan_unroll=2),
        "bf16_states_noremat": dict(state_dtype=jnp.bfloat16,
                                    remat=False),
        "fp8_states_remat_u1": dict(state_dtype=jnp.float8_e4m3fn),
        "fp8_states_noremat": dict(state_dtype=jnp.float8_e4m3fn,
                                   remat=False),
        # time-batched schedule (Trainer(time_batched=True)): remat
        # here means segment-level jax.checkpoint in forward_seq
        "seq_bf16_states": dict(state_dtype=jnp.bfloat16,
                                time_batched=True),
        "seq_bf16_states_noremat": dict(state_dtype=jnp.bfloat16,
                                        remat=False, time_batched=True),
        "seq_fp8_states": dict(state_dtype=jnp.float8_e4m3fn,
                               time_batched=True),
        # hybrid: time-batched backbone (the 720p/360p state-heavy
        # stages) + per-step neck/heads
        "hybrid_bf16_states": dict(state_dtype=jnp.bfloat16,
                                   time_batched="hybrid"),
        # space-to-depth stem (exact-numerics plan; the 720x1280 Cin=2
        # stem conv is the biggest single unit in fwd AND bwd)
        "s2d_bf16_states_remat_u1": dict(state_dtype=jnp.bfloat16,
                                         s2d_stem=True),
        "s2d_hybrid_bf16_states": dict(state_dtype=jnp.bfloat16,
                                       time_batched="hybrid",
                                       s2d_stem=True),
    }
    results = {}
    for name, kwargs in variants.items():
        try:
            results[name] = measure(T, B, **kwargs)
        except Exception as e:  # OOM at this geometry is a data point
            msg = f"{type(e).__name__}: {e}"
            # The remote compile helper surfaces HBM RESOURCE_EXHAUSTED
            # as a bare "HTTP 500"; the round-5 bisection
            # (benchmarks/repro_1mpx_compile.py, log/chip_r05/
            # repro_1mpx.log) confirmed every such row at this geometry
            # is an OOM (noremat: BPTT activation set; time-batched:
            # 2-4x padded-layout expansion of the [T*B,H,W,C] reshapes).
            oom = ("RESOURCE_EXHAUSTED" in msg
                   or ("HTTP 500" in msg and "remote_compile" in msg))
            results[name] = {"oom": True, "error": msg[:200]} if oom \
                else {"error": msg[:200]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({
        "metric": "1mpx_train_state_traffic",
        "geometry": {"T": T, "B": B, "hw": [H, W]},
        "results": results,
    }))


if __name__ == "__main__":
    main()
