#!/usr/bin/env python3
"""Headline benchmark: GEN1 event-frames/sec/chip at T=32 inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- TPU side: flagship TinyYolo (exact reference architecture,
  4,228,544 params), bf16 activations, full 32-step stateful forward as
  one jitted lax.scan, batch of sequences. Throughput counts processed
  event frames (T x B) per second of steady-state wall clock, with the
  dispatch overhead of the tunnel amortized over pipelined calls.
  SCOPE: the headline times the network forward (backbone+neck+head
  raw predictions) — the same scope as BASELINE.md's metric. Box
  decode + NMS run once per sequence (not per frame) in real eval and
  are timed separately in benchmarks/bench_streaming.py (detect-path
  latency) rather than folded into this number.
- Baseline: the same architecture executed with PyTorch on the host CPU
  (the reference's own stack minus the GPU it assumes;
  /root/reference/config/config.yaml:34 — the driver's north star is
  ">= 10x PyTorch-CPU on one v5e chip", BASELINE.md). norse is not
  installed here, so the LIF/LI dynamics are implemented inline with
  the same Euler math (SURVEY.md §2.5).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

T = 32
H, W = 240, 304
# Batch is a free variable of the frames/s/chip metric (BASELINE.md),
# and the curve is non-monotonic (chip-measured, round 4:
# B=8 3660 > B=64 3575 > B=16 3315 > B=32 2978 — log/chip_r04b/
# batch_scaling.log), so the bench sweeps it instead of fixing B=16.
# Override with BENCH_BATCHES="8,16" to trim the search. The round-5
# big-batch probes found a second, higher-throughput regime past the
# original {8..64} edge — BOTH paths peak at B=128 (bf16 5713, e5m2
# 7694 f/s vs 3653/4962 at the old optima; log/chip_r05/
# {bf16,e5m2}_big_batch.log) — so the default sweep covers it. 16/32
# are dropped from the default (documented losers at every geometry;
# re-include via this env if the curve needs re-mapping).
_bs = os.environ.get("BENCH_BATCHES", "8,64,96,128,192")
BATCHES = tuple(int(s) for s in _bs.split(",") if s.strip())
# Tunnel-outage resilience: probe the backend in a SUBPROCESS with a
# hard timeout (an outage manifests as a hung device call, which no
# in-process try/except can bound), and back off between attempts.
# Round-3 lesson: a transient outage zeroed the round's bench.
PROBE_TIMEOUT_S = 150
# Default worst case must stay well inside the caller's timeout budget
# or the last-good replay never runs (the queue bounds bench at 1800 s;
# the driver's budget is unknown): 5 backoffs (600 s) + 6 probes
# (900 s) = 25 min absolute worst, after which replay still fires.
# Callers that already KNOW the tunnel state (scripts/run_chip_queue.sh
# runs only after the watcher's probe succeeds) override with
# BENCH_PROBE_BACKOFFS="" (single probe, instant replay on failure) or
# a custom comma-separated schedule.
_env = os.environ.get("BENCH_PROBE_BACKOFFS")
PROBE_BACKOFFS_S = (
    tuple(int(s) for s in _env.split(",") if s.strip())
    if _env is not None
    else (20, 40, 80, 160, 300)
)
# Fixed-duration baseline measurement: repeat the torch forward until
# this much wall clock has elapsed (round-2 lesson: 2 fixed reps swung
# the ratio 412x -> 562x run-to-run; a >= 30 s window with a pinned
# thread count is reproducible within ~5%).
TORCH_MIN_SECONDS = 30.0


def wait_for_backend() -> bool:
    """Probe the device backend in a subprocess, retrying with backoff.

    Returns True once a tiny jitted op completes; False if every
    attempt failed/hung (the caller proceeds anyway and fails loud).
    """
    probe = (
        "import jax, jax.numpy as jnp; "
        "jax.jit(lambda a: a + 1)(jnp.ones(8)).block_until_ready()"
    )
    for i, backoff in enumerate((0,) + PROBE_BACKOFFS_S):
        if backoff:
            print(
                f"[bench] backend down, retry {i}/{len(PROBE_BACKOFFS_S)} "
                f"in {backoff}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(backoff)
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=PROBE_TIMEOUT_S,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
            sys.stderr.write(r.stderr.decode(errors="replace")[-500:])
        except subprocess.TimeoutExpired:
            print("[bench] backend probe hung", file=sys.stderr, flush=True)
    return False


def time_compiled_forward(forward, p, stats, X, reps: int = 10) -> float:
    """Canonical compile-and-time harness, shared with
    benchmarks/bench_batch_scaling.py so the headline bench and the
    scaling study can't drift to different measurement methodologies.

    Compiles ``forward(p, stats, X) -> (scalar, scalar)`` with X in
    XLA's AUTO layout and hands it frames already in that layout —
    kills the per-call relayout copy the default row-major layout
    forces (+4-5%); the loader-side transfer does the relayout during
    host->device copy, off the model's critical path. Warms once, then
    times windows of pipelined dispatches (each closed by one sync)
    and returns the fastest window's seconds per call — the min is
    immune to the dev tunnel's intermittent multi-second RPC stalls,
    which only ever inflate a window (benchmarks/_util.py)."""
    import jax

    try:
        from jax.experimental.layout import Format, Layout

        fwd = jax.jit(
            forward, in_shardings=(None, None, Format(Layout.AUTO))
        )
        compiled = fwd.lower(p, stats, X).compile()
        X = jax.device_put(X, compiled.input_formats[0][2])
        fwd = compiled
    except Exception:
        fwd = jax.jit(forward)
    s, _ = fwd(p, stats, X)
    float(s)  # compile + warm

    windows = 5
    per = max(1, -(-reps // windows))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fwd(p, stats, X) for _ in range(per)]
        float(outs[-1][0])  # one sync closes the pipelined window
        best = min(best, (time.perf_counter() - t0) / per)
    return best


def bench_tpu() -> "tuple[float, dict]":
    import jax
    import jax.numpy as jnp

    from snn_for_object_detection_tpu.models import TinyYolo
    from snn_for_object_detection_tpu.ops import quantize as Q

    # Fast inference config: bf16 activations AND bf16 neuron-state
    # storage (the LIF state HBM traffic dominates; bf16 states measure
    # 1.6x over fp32 end-to-end), uint8 input frames.
    model = TinyYolo(num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
                     state_dtype=jnp.bfloat16, remat=False, scan_unroll=2)
    params, stats = model.init(jax.random.PRNGKey(0))

    def make_X(batch: int):
        return jnp.asarray(
            np.random.default_rng(0).random((T, batch, H, W, 2)) < 0.1,
            jnp.uint8,
        )

    def make_forward(fwd_method):
        def forward(params, stats, X):
            (cls_p, box_p), _, _ = fwd_method(params, stats, X)
            # scalar outputs: keep device->host fetch out of the timing
            return cls_p.sum(), box_p.sum()

        return forward

    def time_forward(p, X, fwd_method=model.forward) -> float:
        """Steady-state event-frames/s for one params tree."""
        dt = time_compiled_forward(make_forward(fwd_method), p, stats, X)
        return T * X.shape[1] / dt

    # Stage 1: batch sweep on the production bf16 path (the curve is
    # non-monotonic; see BATCHES above).
    sweep = {batch: time_forward(params, make_X(batch))
             for batch in BATCHES}
    B, fps_bf16 = max(sweep.items(), key=lambda kv: kv[1])
    X = make_X(B)

    # Stage 2: alternate compositions at the winning batch.
    #
    # int8 PTQ convs (ops/quantize.py): spikes are binary so symmetric
    # int8 is exact on most conv inputs. Round-3 measured +8.1% with
    # the bf16 dequant chain; the round-4 f32-dequant regression is
    # reverted (compile.py _INT8_DEQUANT_F32). Calibrate on a short
    # slice of the bench stream; fall back to bf16 on any failure.
    fps_int8 = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            absmax = Q.calibrate(model, params, stats, X[:8, :4])
            qparams = Q.quantize(params, absmax)
            fps_int8 = time_forward(qparams, X)
        except Exception as e:
            print(f"[bench] int8 path failed: {e}", file=sys.stderr)

    # Time-batched schedule (forward_seq — convs folded over T*B,
    # temporal Pallas cells with VMEM-resident state). Chip-measured
    # LOSING for GEN1 inference every round (r04: 2365 vs 3307 f/s) —
    # kept in the search because schedule reworks can move the
    # crossover, but only one compile (no int8 composition).
    fps_seq = None
    if os.environ.get("BENCH_SEQ", "1") != "0":
        try:
            fps_seq = time_forward(params, X, model.forward_seq)
        except Exception as e:
            print(f"[bench] forward_seq path failed: {e}", file=sys.stderr)

    # fp8 neuron-state storage (state_dtype=float8_e5m2/e4m3): halves
    # the LIF/LI state HBM traffic again on top of bf16 — the round-5
    # ablation pinned the cells at 47% of the forward (80.5 vs 43.0 ms
    # with cells swapped for ReLU, log/chip_r05/ablation.log), and the
    # fp8 sweep measured e5m2 +16%/+31% at B=8/16 with mAP50 deltas
    # below the micro-val's ~±0.03 resolution on every checkpoint
    # tried (log/chip_r05/fp8_states.log + state_map_xckpt.log).
    # Update math stays fp32; only the carried (v, i) storage narrows.
    fps_e5m2 = fps_e4m3 = fps_e5m2_int8 = None
    B_e5m2 = B
    e5m2_unroll = 2
    sweep_e5m2 = {}
    if os.environ.get("BENCH_FP8_STATES", "1") != "0":
        try:
            def fp8_model(sd):
                return TinyYolo(
                    num_classes=2, in_hw=(H, W),
                    compute_dtype=jnp.bfloat16, state_dtype=sd,
                    remat=False, scan_unroll=2,
                )

            m_e5m2 = fp8_model(jnp.float8_e5m2)
            # e5m2's batch curve differs from bf16's (lighter state
            # HBM traffic moves the optimum), so it gets its own sweep.
            sweep_e5m2 = {
                batch: time_forward(params, make_X(batch), m_e5m2.forward)
                for batch in BATCHES
            }
            B_e5m2, fps_e5m2 = max(
                sweep_e5m2.items(), key=lambda kv: kv[1]
            )
            X_e5m2 = make_X(B_e5m2)
            # scan unroll: 4 measured +1.7% over the shipped 2 at the
            # B=128 lane-axis geometry (7675 vs 7550 same-run,
            # log/chip_r05b/unroll_probe.log; 1 -> 7120, 8 -> 7557),
            # so the search tries it at the winning batch and keeps
            # the max.
            m_e5m2_u4 = TinyYolo(
                num_classes=2, in_hw=(H, W),
                compute_dtype=jnp.bfloat16, state_dtype=jnp.float8_e5m2,
                remat=False, scan_unroll=4,
            )
            fps_u4 = time_forward(params, X_e5m2, m_e5m2_u4.forward)
            e5m2_unroll = 2
            if fps_u4 > fps_e5m2:
                fps_e5m2, m_e5m2, e5m2_unroll = fps_u4, m_e5m2_u4, 4
                sweep_e5m2[B_e5m2] = fps_u4
            fps_e4m3 = time_forward(
                params, X_e5m2, fp8_model(jnp.float8_e4m3fn).forward
            )
            if fps_int8 is not None:
                fps_e5m2_int8 = time_forward(
                    qparams, X_e5m2, m_e5m2.forward
                )
        except Exception as e:
            print(f"[bench] fp8-states path failed: {e}", file=sys.stderr)

    # Space-to-depth stem: chip-measured NEGATIVE everywhere (r04:
    # 0.926x GEN1 unit, 0.49x 1Mpx unit, 0.979x full model —
    # log/chip_r04b/s2d_stem.log; docs/perf.md "s2d stem"), so it is
    # OUT of the default search. BENCH_S2D=1 re-includes it.
    fps_s2d = fps_s2d_int8 = None
    if os.environ.get("BENCH_S2D", "0") != "0":
        try:
            model_s2d = TinyYolo(
                num_classes=2, in_hw=(H, W), compute_dtype=jnp.bfloat16,
                state_dtype=jnp.bfloat16, remat=False, scan_unroll=2,
                s2d_stem=True,
            )
            fps_s2d = time_forward(params, X, model_s2d.forward)
            if fps_int8 is not None:
                fps_s2d_int8 = time_forward(qparams, X, model_s2d.forward)
        except Exception as e:
            print(f"[bench] s2d-stem path failed: {e}", file=sys.stderr)

    detail = {
        "bf16_frames_per_sec": round(fps_bf16, 1),
        "batch": B,
        "batch_sweep": {str(b): round(v, 1) for b, v in sweep.items()},
    }
    if sweep_e5m2:
        detail["e5m2_batch"] = B_e5m2
        detail["e5m2_unroll"] = e5m2_unroll
        detail["e5m2_batch_sweep"] = {
            str(b): round(v, 1) for b, v in sweep_e5m2.items()
        }
    for key, v in (
        ("int8_frames_per_sec", fps_int8),
        ("e5m2_states_frames_per_sec", fps_e5m2),
        ("e4m3_states_frames_per_sec", fps_e4m3),
        ("e5m2_states_int8_frames_per_sec", fps_e5m2_int8),
        ("seq_frames_per_sec", fps_seq),
        ("s2d_frames_per_sec", fps_s2d),
        ("s2d_int8_frames_per_sec", fps_s2d_int8),
    ):
        if v is not None:
            detail[key] = round(v, 1)
    candidates = {
        f"bf16-acts + bf16-states @ B={B}": fps_bf16,
        f"bf16-acts + bf16-states + int8-ptq-convs @ B={B}": fps_int8,
        f"bf16-acts + e5m2-states @ B={B_e5m2}": fps_e5m2,
        f"bf16-acts + e4m3-states @ B={B_e5m2}": fps_e4m3,
        f"bf16-acts + e5m2-states + int8-ptq-convs @ B={B_e5m2}":
            fps_e5m2_int8,
        f"bf16-acts + bf16-states + time-batched @ B={B}": fps_seq,
        f"bf16-acts + bf16-states + s2d-stem @ B={B}": fps_s2d,
        f"bf16-acts + bf16-states + int8-ptq-convs + s2d-stem @ B={B}":
            fps_s2d_int8,
    }
    cfg, best = max(
        ((k, v) for k, v in candidates.items() if v is not None),
        key=lambda kv: kv[1],
    )
    detail["config"] = cfg
    return best, detail


def bench_torch_cpu() -> float:
    """Reference-equivalent TinyYolo forward in PyTorch on CPU."""
    import torch
    import torch.nn as nn

    torch.set_grad_enabled(False)
    torch.set_num_threads(1)  # pinned: this image exposes one core

    class LIF(nn.Module):
        def forward(self, x, state):
            v, i = state if state is not None else (0.0, 0.0)
            dv = 1e-3 * 100.0 * (-v + i) if state is not None else 0.0
            v_dec = v + dv if state is not None else torch.zeros_like(x)
            i_dec = i - 1e-3 * 200.0 * i if state is not None else torch.zeros_like(x)
            z = (v_dec - 1.0 > 0).float()
            v_new = (1 - z) * v_dec
            i_new = i_dec + x
            return z, (v_new, i_new)

    class LI(nn.Module):
        def forward(self, x, state):
            v, i = state if state is not None else (
                torch.zeros_like(x), torch.zeros_like(x)
            )
            i_jump = i + x
            v_new = v + 1e-3 * 100.0 * (-v + i_jump)
            i_dec = i_jump - 1e-3 * 200.0 * i_jump
            return v_new, (v_new, i_dec)

    stateful_types = (LIF, LI)

    def make_branch(cfg, ch):
        layers = []
        for el in cfg:
            if isinstance(el, tuple) and el and el[0] in ("R", "D"):
                m, ch = make_block(el, ch)
            else:
                kind = el[0]
                if kind == "conv":
                    out = ch if el[1] is None else el[1]
                    m = nn.Conv2d(ch, out, el[2], el[3],
                                  padding=el[2] // 2, bias=False)
                    ch = out
                elif kind == "norm":
                    m = nn.BatchNorm2d(ch)
                    m.eval()
                elif kind == "lif":
                    m = LIF()
                elif kind == "li":
                    m = LI()
                else:
                    m = nn.Identity()
            layers.append(m)
        return layers, ch

    class Block(nn.Module):
        def __init__(self, marked, ch):
            super().__init__()
            self.mode = marked[0]
            branches = marked[1] if self.mode in ("R", "D") else [marked[1]]
            mods, outs = [], []
            for b in branches:
                layers, c = make_branch(b, ch)
                mods.append(nn.ModuleList(layers))
                outs.append(c)
            self.branches = nn.ModuleList(mods)
            self.out_ch = (
                outs[0] if self.mode == "R"
                else sum(outs) if self.mode == "D" else outs[-1]
            )

        def forward(self, x, state):
            state = state or [None] * len(self.branches)
            outs, new_state = [], []
            for branch, bstate in zip(self.branches, state):
                bstate = bstate or [None] * len(branch)
                y = x
                ns = []
                for idx, layer in enumerate(branch):
                    if isinstance(layer, (Block, *stateful_types)):
                        y, s = layer(y, bstate[idx])
                        ns.append(s)
                    else:
                        y = layer(y)
                        ns.append(None)
                outs.append(y)
                new_state.append(ns)
            if self.mode == "R":
                y = sum(outs)
            elif self.mode == "D":
                y = torch.cat(outs, dim=1)
            else:
                y = outs[0]
            return y, new_state

    def make_block(marked, ch):
        blk = Block(marked, ch)
        return blk, blk.out_ch

    def _conv(out=None, k=3, s=1):
        return [("conv", out, k, s), ("norm",), ("lif",)]

    def _bot():
        return ("R", [[*_conv()], [("id",)]])

    def _rec(n):
        return [] if n == 0 else [("D", [[_bot(), *_rec(n - 1)], [("id",)]])]

    def _c2f(out, n):
        return [
            ("conv", out, 1, 1),
            ("D", [[("conv", out // 2, 1, 1), *_rec(n)],
                   [("conv", out // 2, 1, 1)]]),
            ("conv", out, 1, 1),
        ]

    backbone_cfg = ("P", [*_conv(64, 3, 2), *_c2f(64, 2),
                          *_conv(128, 3, 2), *_c2f(128, 3)])
    neck_parts = [
        ("P", [*_conv(256, 3, 2), *_c2f(256, 4)]),
        ("P", [*_conv(256, 3, 2), *_c2f(256, 3)]),
        ("P", [*_conv(256, 3, 2), *_c2f(256, 2)]),
    ]
    head_cfg = ("P", [("conv", None, 1, 1), ("norm",), ("li",)])

    backbone, ch = make_block(backbone_cfg, 2)
    necks, nch = [], ch
    for part in neck_parts:
        blk, nch = make_block(part, nch)
        necks.append(blk)
    heads = []
    for _ in range(3):
        base, bch = make_block(head_cfg, 256)
        box = nn.Conv2d(bch, 36, 1, bias=False)
        cls = nn.Conv2d(bch, 27, 1, bias=False)
        heads.append((base, box, cls))

    x_seq = torch.from_numpy(
        (np.random.default_rng(0).random((T, 1, 2, H, W)) < 0.1).astype(
            np.float32
        )
    )

    def run_once():
        state = [None] * 7
        for t in range(T):
            y, state[0] = backbone(x_seq[t], state[0])
            feats = []
            for i, blk in enumerate(necks):
                y, state[1 + i] = blk(y, state[1 + i])
                feats.append(y)
            for i, ((base, box, cls), f) in enumerate(zip(heads, feats)):
                b, state[4 + i] = base(f, state[4 + i])
                bo = box(b)
                cl = cls(b)
        return bo, cl

    run_once()  # warm
    # Best window wins, mirroring the TPU-side protocol: a loaded host
    # (e.g. a concurrent compile) would otherwise UNDER-measure the
    # baseline and flatter vs_baseline — one run recorded 3.5 f/s vs
    # the quiet-host 5.5-6.5 (log/chip_r05b/bench.log).
    best = 0.0
    t_all = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        run_once()
        best = max(best, T / (time.perf_counter() - t0))
        if time.perf_counter() - t_all >= TORCH_MIN_SECONDS:
            break
    return best  # torch runs batch 1


LAST_GOOD_PATH = os.path.join(os.path.dirname(__file__) or ".",
                              "BENCH_LAST_GOOD.json")


def _replay_last_good(reason: str) -> bool:
    """Emit the most recent chip-measured result, marked stale.

    A multi-hour tunnel outage (rounds 3-4) must not zero the round's
    bench to an unparseable rc=1: if the backend never comes up, replay
    the last driver-format result that WAS measured on chip, clearly
    annotated so nobody mistakes it for a fresh number.
    """
    try:
        with open(LAST_GOOD_PATH) as f:
            rec = json.load(f)
    except Exception:
        return False
    rec["stale"] = True
    rec["stale_reason"] = (
        f"{reason}; value replayed from {os.path.basename(LAST_GOOD_PATH)}"
        f" (chip-measured {rec.get('measured_at', 'earlier')})"
    )
    print(json.dumps(rec), flush=True)
    return True


def _record_last_good(result: dict) -> None:
    """Persist a freshly chip-measured result for outage replay."""
    import jax

    if jax.default_backend() == "cpu":
        return  # only real-device numbers are worth replaying
    rec = dict(result)
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")  # POSIX-friendly: keep diffs noise-free
    except OSError as e:
        print(f"[bench] could not record last-good: {e}", file=sys.stderr)


def main():
    if not wait_for_backend():
        if _replay_last_good("TPU backend unreachable after all retries"):
            return
        print(
            "[bench] backend never came up; attempting anyway",
            file=sys.stderr,
            flush=True,
        )
    try:
        tpu_fps, tpu_detail = bench_tpu()
    except Exception as e:
        if _replay_last_good(f"device bench failed mid-run: {e!r:.200}"):
            return
        raise
    try:
        cpu_fps = bench_torch_cpu()
    except Exception as e:  # torch baseline is best-effort
        print(f"[bench] torch baseline failed: {e}", file=sys.stderr)
        cpu_fps = float("nan")
    vs = tpu_fps / cpu_fps if np.isfinite(cpu_fps) and cpu_fps > 0 else None
    result = {
        "metric": "gen1_event_frames_per_sec_per_chip_T32",
        "value": round(tpu_fps, 1),
        "unit": "event-frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "tpu": tpu_detail,
        "baseline": {
            "pytorch_cpu_frames_per_sec": (
                round(cpu_fps, 1) if np.isfinite(cpu_fps) else None
            ),
            "measurement": (
                f">= {TORCH_MIN_SECONDS:.0f} s fixed-duration, "
                "1 torch thread"
            ),
        },
    }
    _record_last_good(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
