"""Train-to-mAP regression gate (end-to-end detection-quality guard).

Loss-delta tests pass even when detection quality silently regresses;
this gate trains the FLAGSHIP TinyYolo at the reference training
geometry (T=32, B=4, random-start window 16 — config/config.yaml
semantics) on the deterministic synthetic event stream and asserts the
synthetic-val mAP@0.5 reaches a pinned floor.

Budget/floor calibration (round-3 multi-seed sweep,
``benchmarks/bench_state_convergence.py``, docs/perf.md "bf16-state
convergence"): trajectories are CHAOTIC — spike thresholds amplify
numeric noise, so adjacent evals of the same run swing 2-3x (seed-0
fp32: 0.036 / 0.056 / 0.076 / 0.164 / 0.064 / 0.097 over 1800 steps).
The gate therefore asserts the trajectory MAX, with a floor (0.06)
chosen below every observed seed's max (seed 0: 0.164, seed 1: 0.094,
bf16 seed 0: 0.114) but far above a broken model's ~0.00-0.01 — it
catches silently destroyed training dynamics, not jitter.

The run needs a real accelerator (~20 min on one v5e chip; a CPU run
of the same budget takes hours — calibrated and rejected in round 3),
so the gate is marker-gated: it runs only with ``RUN_TRAIN_GATE=1``.
CI keeps it visible as a skip; the driver/perf runs execute it.
"""

import json
import os

import pytest

pytestmark = pytest.mark.train_gate

GATE_STEPS_PER_EPOCH = 100
GATE_EPOCHS = 18          # 1800 steps total
GATE_VAL_EVERY = 3        # evals every 300 steps
MAP50_FLOOR = 0.06


@pytest.mark.skipif(
    os.environ.get("RUN_TRAIN_GATE") != "1",
    reason="chip-scale gate; set RUN_TRAIN_GATE=1 (~10 min on one v5e)",
)
def test_train_to_map_floor():
    from benchmarks.bench_state_convergence import run
    from snn_for_object_detection_tpu.data.synthetic import (
        make_synthetic_dataset,
    )
    import jax.numpy as jnp

    root = make_synthetic_dataset(
        "/tmp/state_conv_data", records_per_split=4, duration_ms=4000
    )
    result = run(root, "gate", jnp.float32, GATE_STEPS_PER_EPOCH,
                 GATE_EPOCHS, seed=0, val_every=GATE_VAL_EVERY)
    assert result["map50"], "no validation epoch ran"
    best = max(m for _, m in result["map50"])
    print(json.dumps({
        "trajectory": result["map50"], "best_map_50": best,
        "floor": MAP50_FLOOR,
    }))
    assert best >= MAP50_FLOOR, (
        f"training dynamics regressed: best map_50={best:.4f} over "
        f"{GATE_STEPS_PER_EPOCH * GATE_EPOCHS} steps is below the "
        f"pinned floor {MAP50_FLOOR} (calibration: docs/perf.md "
        "round-3 convergence sweep)"
    )
