"""Shared benchmark measurement helper.

One definition of the timing protocol so every benchmark measures the
same way: warm-up call (compiles), then ``reps`` back-to-back calls,
synced by a HOST FETCH of the scalar output — on the tunneled dev
platform ``block_until_ready`` returns before execution finishes, so
fetching the value is the only reliable barrier (bench.py's finding).
"""

from __future__ import annotations

import time


def timeit(fn, *args, reps: int = 10) -> float:
    """Mean seconds per call of ``fn(*args)`` (jitted; scalar-ish
    output — the sync fetches ``float()`` of it)."""
    float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    float(outs[-1])
    return (time.perf_counter() - t0) / reps
