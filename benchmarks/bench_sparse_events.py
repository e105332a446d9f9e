#!/usr/bin/env python3
"""Sparse event-domain processing probe (ROADMAP research item 3).

Question: can the stage-1 entry unit skip empty regions of the event
frame? TPU constraint: no dynamic shapes, so sparsity must be a
static-capacity gather — pick the occupied row-bands (8 output rows =
16 input rows + 1 halo for the stride-2 3×3), conv only those, and
scatter the results into a dense output for the (cheap, dense) BN +
LIF. Capacity is a fixed fraction of bands; overflow falls back to
counting the densest bands first would need sorting, so this probe
uses a simple prefix-capacity (first M occupied bands) — adequate for
a feasibility measurement.

Reports (a) measured band-occupancy statistics on the synthetic GEN1
stream, and (b) dense vs sparse unit times at swept occupancies.

Run on the real chip:  python benchmarks/bench_sparse_events.py
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

T, B, H, W = 32, 16, 240, 304
CIN, COUT = 2, 64
BAND = 16          # input rows per band (8 output rows at stride 2)
NB = H // BAND     # 15 bands


from benchmarks._util import timeit  # noqa: E402  (shared protocol)


def dense_unit(x, w, a, b, v0):
    def body(st, xt):
        y = jax.lax.conv_general_dilated(
            xt, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * a + b
        z, st = neurons.lif_step(y.astype(st.v.dtype), st)
        return st, z.sum()

    _, s = jax.lax.scan(body, neurons.LIFState(v0, v0), x)
    return s.sum()


def make_sparse_unit(cap):
    """cap = static max occupied bands processed per image."""

    def sparse_unit(x, w, a, b, v0):
        # pre-pad one row top/bottom so every band slice carries its
        # conv halo (stride-2 k=3 pad=1 geometry)
        def body(st, xt):
            xp = jnp.pad(xt, ((0, 0), (1, 1), (1, 1), (0, 0)))
            # [B, NB] occupancy mask from the raw frame
            occ = (
                xt.reshape(B, NB, BAND * W * CIN).astype(jnp.float32)
                .max(axis=-1) > 0
            )
            # first-M occupied band indices per image (static cap)
            idx = jnp.argsort(~occ, axis=1)[:, :cap]        # [B, cap]
            valid = jnp.take_along_axis(occ, idx, axis=1)   # [B, cap]
            # gather band slabs with halo: rows i*BAND .. i*BAND+BAND+1
            starts = idx * BAND                              # into xp rows
            def gather_img(xpi, s):
                return jax.vmap(
                    lambda r: jax.lax.dynamic_slice(
                        xpi, (r, 0, 0), (BAND + 2, W + 2, CIN)
                    )
                )(s)
            slabs = jax.vmap(gather_img)(xp, starts)  # [B,cap,BAND+2,W+2,C]
            y = jax.lax.conv_general_dilated(
                slabs.reshape(B * cap, BAND + 2, W + 2, CIN), w,
                (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(B, cap, BAND // 2, W // 2, COUT)
            y = y * valid[:, :, None, None, None]
            # scatter back into the dense output grid
            out = jnp.zeros((B, NB, BAND // 2, W // 2, COUT), y.dtype)
            out = jax.vmap(
                lambda o, i, v: o.at[i].set(v)
            )(out, idx, y).reshape(B, H // 2, W // 2, COUT)
            out = out * a + b
            z, st = neurons.lif_step(out.astype(st.v.dtype), st)
            return st, z.sum()

        _, s = jax.lax.scan(body, neurons.LIFState(v0, v0), x)
        return s.sum()

    return sparse_unit


def main():
    rng = np.random.default_rng(0)

    # --- occupancy statistics on the synthetic GEN1 stream ---
    from snn_for_object_detection_tpu.data import PropheseeDataModule
    from snn_for_object_detection_tpu.data.synthetic import (
        make_synthetic_dataset,
    )

    root = make_synthetic_dataset(
        "/tmp/sparse_probe_data", records_per_split=2, duration_ms=2000
    )
    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=4, num_workers=1,
        num_load_file=2, num_steps=16, time_step=16, time_shift=8,
        max_labels=16, seed=0,
    )
    loader = dm.val_loader()
    occs = []
    for i, (X, _) in enumerate(loader):
        if i >= 3:
            break
        xb = np.asarray(X)  # [T, B, H, W, 2]
        bands = xb.reshape(xb.shape[0], xb.shape[1], NB, BAND, W, CIN)
        occs.append((bands.max(axis=(3, 4, 5)) > 0).mean())
    if hasattr(loader, "close"):
        loader.close()
    occ_frac = float(np.mean(occs))
    print(f"synthetic-stream band occupancy: {occ_frac:.2%}", flush=True)

    # --- unit timings at swept occupancies ---
    w = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)) * 0.2, jnp.bfloat16)
    a = jnp.asarray(rng.random(COUT) + 0.5, jnp.float32)
    bb = jnp.asarray(rng.normal(size=COUT) * 0.1, jnp.float32)
    v0 = jnp.zeros((B, H // 2, W // 2, COUT), jnp.bfloat16)

    results = {"band_occupancy_measured": round(occ_frac, 4)}
    dt_dense = None
    for frac in (0.25, 0.5, 1.0):
        # frames whose events live in the first `frac` of bands
        x_np = (rng.random((T, B, H, W, CIN)) < 0.1).astype(np.float32)
        cut = int(H * frac)
        x_np[:, :, cut:] = 0.0
        x = jnp.asarray(x_np, jnp.bfloat16)
        if dt_dense is None:
            dt_dense = timeit(jax.jit(dense_unit), x, w, a, bb, v0)
            results["dense_ms"] = round(dt_dense * 1e3, 2)
            print(f"dense: {dt_dense * 1e3:.1f} ms", flush=True)
        cap = max(int(NB * frac), 1)
        fn = jax.jit(make_sparse_unit(cap))
        try:
            dt = timeit(fn, x, w, a, bb, v0)
            results[f"sparse_cap{cap}_ms"] = round(dt * 1e3, 2)
            print(
                f"sparse cap={cap}/{NB} ({frac:.0%} occupied): "
                f"{dt * 1e3:.1f} ms ({dt_dense / dt:.2f}x)",
                flush=True,
            )
        except Exception as e:
            results[f"sparse_cap{cap}_error"] = f"{type(e).__name__}"[:80]
            print(f"sparse cap={cap}: {type(e).__name__}: {e}"[:200],
                  flush=True)

    print(json.dumps({"metric": "sparse_event_probe", **results}))


if __name__ == "__main__":
    main()
