"""Native C++ event kernel tests: parity with the numpy path."""

import numpy as np
import pytest

from snn_for_object_detection_tpu.data.psee import _decode
from snn_for_object_detection_tpu.data.rasterize import rasterize
from snn_for_object_detection_tpu.native import (
    decode_events_native,
    is_available,
    rasterize_records_native,
)

pytestmark = pytest.mark.skipif(
    not is_available(), reason="native toolchain unavailable"
)


def make_records(rng, n, t_max=1_000_000, w=304, h=240):
    t = np.sort(rng.integers(0, t_max, n)).astype(np.uint32)
    x = rng.integers(0, w, n).astype(np.uint32)
    y = rng.integers(0, h, n).astype(np.uint32)
    p = rng.integers(0, 2, n).astype(np.uint32)
    records = np.empty((n, 2), np.uint32)
    records[:, 0] = t
    records[:, 1] = x | (y << 14) | (p << 28)
    return records


def test_decode_parity(rng):
    records = make_records(rng, 5000)
    got = decode_events_native(records)
    exp = _decode(records)
    for k in ("t", "x", "y", "p"):
        np.testing.assert_array_equal(got[k], exp[k])


def test_rasterize_parity(rng):
    records = make_records(rng, 20000, t_max=160_000)
    t_min, step, steps = 32_000, 16_000, 8
    frames, count = rasterize_records_native(
        records, t_min, step, steps, 240, 304
    )
    # numpy path
    ev = _decode(records)
    sel = (ev["t"] >= t_min) & (ev["t"] < t_min + step * steps)
    ev = {k: v[sel] for k, v in ev.items()}
    tidx = (ev["t"].astype(np.int64) - t_min) // step
    exp = rasterize(ev, tidx, steps, 240, 304)
    np.testing.assert_array_equal(frames, exp)
    assert count == int(sel.sum())


def test_rasterize_clip_x(rng):
    # events beyond width get clipped into frame when clip_x=True
    records = np.array([[100, 400 | (10 << 14) | (1 << 28)]], np.uint32)
    frames, count = rasterize_records_native(
        records, 0, 1000, 1, 240, 304, clip_x=True
    )
    assert count == 1
    assert frames[0, 10, 303, 1] == 1.0
    frames2, count2 = rasterize_records_native(
        records, 0, 1000, 1, 240, 304, clip_x=False
    )
    assert count2 == 1  # counted in-window...
    assert frames2.sum() == 0  # ...but not scattered (out of bounds)


def test_rasterize_out_reuse(rng):
    records = make_records(rng, 100, t_max=10_000)
    out = np.full((2, 240, 304, 2), 7.0, np.float32)
    frames, _ = rasterize_records_native(
        records, 0, 5_000, 2, 240, 304, out=out
    )
    assert frames is out
    assert set(np.unique(frames)) <= {0.0, 1.0}  # cleared before scatter
