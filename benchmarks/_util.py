"""Shared benchmark measurement helper.

One definition of the timing protocol so every benchmark measures the
same way: warm-up call (compiles), then timed calls synced by a HOST
FETCH of the scalar output — on the tunneled dev platform
``block_until_ready`` returns before execution finishes, so fetching
the value is the only reliable barrier (bench.py's finding).

Round-5 hardening: the dev tunnel intermittently stalls an RPC for
0.5-10 s (the "~every 15-20 min" hang, .claude/skills/verify). A
single-window mean is poisoned by one such stall — identical train
HLOs measured 537/537/539 vs 374/374 f/s across runs, and a stalled
window inflated one step from 512 to 159 f/s
(log/chip_r05/train_batch_fp8*.log, train_sched_e5m2.log). The
protocol is therefore MIN over several windows of back-to-back calls:
stalls only ever ADD time, so the fastest window is the best estimate
of true device throughput, and it is immune to any number of stalls
that leave one window clean.
"""

from __future__ import annotations

import time


def timeit(fn, *args, reps: int = 10, windows: int = 5) -> float:
    """Seconds per call of ``fn(*args)`` (jitted; scalar-ish output —
    the sync fetches ``float()`` of it).

    Runs ``windows`` windows of ``ceil(reps/windows)`` pipelined
    calls, each closed by a host fetch, and returns the fastest
    window's per-call mean (see module docstring for why min).
    """
    float(fn(*args))
    per = max(1, -(-reps // windows))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(per)]
        float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / per)
    return best
