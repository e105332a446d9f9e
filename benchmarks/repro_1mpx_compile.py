#!/usr/bin/env python3
"""Minimal repro / bisection for the 1Mpx train-step compile crashes.

Round-4 chip queue (log/chip_r04b/1mpx_train.log): 6 of 10 variants of
the 1Mpx (720x1280, T=16, B=2) train step died with
`tpu_compile_helper subprocess exit code 1` (HTTP 500 from the remote
compile service). Failing families:

  A. remat=False (both state dtypes)   — per-step scan, no checkpoint
  B. time_batched / hybrid schedules   — forward_seq with the
     GSPMD-partitioned temporal Pallas cells

This script isolates each family on ONE variant, captures the FULL
error (the sweep truncated to 200 chars), and bisects the spatial size
(720p vs 360p vs GEN1 240p) so the crash can be attributed to a
construct (Pallas kernel / custom_partitioning) vs sheer program size.

Each probe runs in a SUBPROCESS: a helper crash can poison the
process-wide compile channel, and a hung compile must not wedge the
sweep (per-probe timeout).

Usage:
    python benchmarks/repro_1mpx_compile.py            # full bisection
    python benchmarks/repro_1mpx_compile.py <probe>    # one probe
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_TIMEOUT_S = int(os.environ.get("REPRO_TIMEOUT_S", "900"))

# (name, H, W, model_kwargs, time_batched)
PROBES = {
    # family A: remat off — bisect height at fixed construct
    "noremat_720p": (720, 1280, dict(remat=False), False),
    "noremat_360p": (360, 640, dict(remat=False), False),
    "noremat_240p": (240, 304, dict(remat=False), False),
    # family A control: does FORWARD-only (no BPTT) compile noremat?
    "noremat_720p_fwd": (720, 1280, dict(remat=False), "fwd_only"),
    # family B: time-batched — bisect height at fixed construct
    "seq_720p": (720, 1280, dict(), True),
    "seq_360p": (360, 640, dict(), True),
    "seq_240p": (240, 304, dict(), True),
    # family B control: forward_seq inference only (no grad)
    "seq_720p_fwd": (720, 1280, dict(), "seq_fwd_only"),
}

_CHILD_CODE = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
import jax, jax.numpy as jnp
import numpy as np
import optax
from snn_for_object_detection_tpu.models import TinyYolo

name, H, W, kwargs_json, mode = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5],
)
kwargs = json.loads(kwargs_json)
T, B = 16, 2
model = TinyYolo(
    num_classes=7, in_hw=(H, W), time_window=4,
    compute_dtype=jnp.bfloat16, state_dtype=jnp.bfloat16, **kwargs,
)
params, stats = model.init(jax.random.PRNGKey(0))
X = jnp.asarray(
    np.random.default_rng(0).random((T, B, H, W, 2)) < 0.05, jnp.uint8
)
labels = np.full((B, 8, 5), -1.0, np.float32)
labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
labels = jnp.asarray(labels)

t0 = time.perf_counter()
if mode in ("fwd_only", "seq_fwd_only"):
    fwd = model.forward_seq if mode == "seq_fwd_only" else model.forward
    f = jax.jit(lambda p, s, x: fwd(p, s, x)[0][0].sum())
    f.lower(params, stats, X).compile()
else:
    time_batched = mode == "True"
    optimizer = optax.adamax(model.learning_rate)
    fwd = model.forward_fn(time_batched)

    def train_step(params, opt_state, stats, X, labels, key):
        r = jax.random.randint(key, (), 0, max(model.time_window, 1))

        def loss_fn(p, stats):
            preds, new_stats, _ = fwd(p, stats, X, start_step=r, train=True)
            return model.loss(preds, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_stats, loss

    opt_state = optimizer.init(params)
    jax.jit(train_step, donate_argnums=(0, 1, 2)).lower(
        params, opt_state, stats, X, labels, jax.random.PRNGKey(1)
    ).compile()
print(json.dumps({
    "probe": name, "ok": True,
    "compile_s": round(time.perf_counter() - t0, 1),
}))
"""


def run_probe(name: str) -> dict:
    H, W, kwargs, tb = PROBES[name]
    mode = tb if isinstance(tb, str) else str(tb)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE.replace("@REPO@", REPO),
             name, str(H), str(W), json.dumps(kwargs), mode],
            timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"probe": name, "ok": False,
                "error": f"compile timeout after {PROBE_TIMEOUT_S}s"}
    for line in r.stdout.splitlines():
        try:
            rec = json.loads(line)
            if rec.get("probe") == name:
                return rec
        except (json.JSONDecodeError, AttributeError):
            continue
    # FULL stderr head + tail — the 200-char truncation is what we're
    # fixing; the head carries the error TYPE (e.g. RESOURCE_EXHAUSTED),
    # the tail the largest-allocations dump
    err = r.stderr
    m = re.search(
        r"(RESOURCE_EXHAUSTED|INTERNAL|INVALID_ARGUMENT|UNIMPLEMENTED"
        r"|FAILED_PRECONDITION)[^\n]*", err,
    )
    return {"probe": name, "ok": False, "rc": r.returncode,
            "error_kind": m.group(0)[:300] if m else None,
            "error_head": err[:1500], "error_tail": err[-4000:]}


def main():
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        print(f"=== {name} ===", flush=True)
        rec = run_probe(name)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
