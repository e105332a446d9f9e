#!/usr/bin/env python3
"""Training-step throughput: full jitted train step (random-start scan
forward + SSD loss + BPTT grad + Adamax) on the flagship TinyYolo.

Prints one JSON line. Run while the chip is otherwise idle.
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
import optax

from snn_for_object_detection_tpu.models import TinyYolo

T, B = 32, 4
H, W = 240, 304


def main():
    model = TinyYolo(num_classes=2, in_hw=(H, W), time_window=16)
    optimizer = optax.adamax(model.learning_rate)
    params, stats = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((T, B, H, W, 2)) < 0.1, jnp.uint8)
    labels = np.full((B, 8, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels = jnp.asarray(labels)

    def train_step(params, opt_state, stats, X, labels, key):
        r = jax.random.randint(key, (), 0, model.time_window)

        def loss_fn(p, stats):
            preds, new_stats, _ = model.forward(
                p, stats, X, start_step=r, train=True
            )
            return model.loss(preds, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(0)
    params, opt_state, stats, loss = step(params, opt_state, stats, X, labels, key)
    float(loss)  # compile + warm

    reps = 10
    t0 = time.perf_counter()
    for k in range(reps):
        params, opt_state, stats, loss = step(
            params, opt_state, stats, X, labels, jax.random.fold_in(key, k)
        )
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {
                "metric": "gen1_train_frames_per_sec_per_chip_T32",
                "value": round(T * B / dt, 1),
                "unit": "event-frames/s (with BPTT grad + Adamax)",
                "step_ms": round(dt * 1e3, 1),
                "batch": B,
            }
        )
    )


if __name__ == "__main__":
    main()
