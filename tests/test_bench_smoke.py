"""CPU smoke of bench.py's device-side composition search.

The chip-queue bench slot is precious during tunnel outages: a runtime
bug in any composition branch (batch sweep, int8 calibrate,
time-batched, s2d stem) would burn it with rc!=0. This runs the REAL
bench_tpu() at a tiny geometry on CPU — every branch executes, every
detail key lands.
"""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tpu_compositions_run_on_cpu(monkeypatch):
    for var in ("BENCH_INT8", "BENCH_SEQ", "BENCH_BATCHES",
                "BENCH_FP8_STATES"):
        monkeypatch.delenv(var, raising=False)  # every branch must run
    monkeypatch.setenv("BENCH_S2D", "1")  # opt-in branch must run too
    spec = importlib.util.spec_from_file_location(
        "bench_smoke", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # tiny geometry: same code paths, CPU-feasible compiles
    bench.T, bench.H, bench.W = 4, 32, 40
    bench.BATCHES = (2, 4)

    fps, detail = bench.bench_tpu()
    assert np.isfinite(fps) and fps > 0
    # every composition produced a number (a branch that silently
    # failed would be missing its key)
    for key in (
        "bf16_frames_per_sec",
        "int8_frames_per_sec",
        "seq_frames_per_sec",
        "s2d_frames_per_sec",
        "s2d_int8_frames_per_sec",
        "e5m2_states_frames_per_sec",
        "e4m3_states_frames_per_sec",
        "e5m2_states_int8_frames_per_sec",
    ):
        assert key in detail, f"composition missing: {key}"
        assert detail[key] > 0
    # the fp8 stage ran its own batch + unroll search
    assert detail["e5m2_batch"] in (2, 4)
    assert detail["e5m2_unroll"] in (2, 4)
    # the batch sweep ran over every configured batch and picked one
    assert set(detail["batch_sweep"]) == {"2", "4"}
    assert detail["batch"] in (2, 4)
    assert detail["config"].startswith("bf16-acts")
    assert detail["config"].endswith(f"B={detail['batch']}")
    best_detail = max(
        v
        for k, v in detail.items()
        if k.endswith("frames_per_sec")
    )
    assert abs(fps - best_detail) < 0.11  # detail values are rounded


def test_timeit_is_immune_to_single_window_stalls():
    """The shared timing protocol (benchmarks/_util.timeit) reports the
    fastest window, so one simulated multi-hundred-ms RPC stall — the
    dev tunnel's known failure mode that turned 512 f/s into 158.8
    (docs/perf.md "Timing protocol") — must not move the result."""
    import sys
    import time

    sys.path.insert(0, REPO)
    from benchmarks._util import timeit

    calls = {"n": 0}

    def fake(_):
        calls["n"] += 1
        # call 0 is the warm-up; put one fat stall mid-run (calls 5-6
        # = the third of five 2-call windows)
        time.sleep(0.25 if calls["n"] in (5, 6) else 0.005)
        return 1.0

    dt = timeit(fake, None, reps=10, windows=5)
    assert calls["n"] == 11  # warm-up + 5 windows x 2 calls
    # clean windows run ~5 ms/call; a mean over all 10 calls would be
    # ~54 ms/call. Generous ceiling for CI-machine scheduling noise:
    assert dt < 0.05, f"stall leaked into the reported time: {dt}"
