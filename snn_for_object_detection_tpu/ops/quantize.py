"""Post-training int8 quantization for the serving/inference path.

TPU-native PTQ: conv weights go to per-output-channel symmetric int8,
activations to per-tensor symmetric int8 with scales taken from a
short calibration run, and every quantized conv executes as an
int8×int8→int32 `conv_general_dilated` on the MXU (v5e int8 peak is
2× bf16) with an fp32 dequant epilogue. BN folding, neuron cells and
the detection decode stay in floating point — on an SNN most conv
inputs are binary spike tensors, which symmetric int8 represents
exactly, so the only lossy layers are the ones fed by analog residual
sums and the LI head stems.

No reference counterpart (the reference serves fp32 torch,
models/soda.py:202-233); this is deployment tooling for the
streaming/serving story. Usage:

    absmax = calibrate(model, params, stats, frames)   # offline
    qparams = quantize(params, absmax)
    model.predict(qparams, stats, frame, state)        # int8 convs

The quantized params pytree has ``{"w_q", "w_scale", "x_scale"}`` conv
leaves (compile.py's conv apply dispatches on the key set), flows
through every inference surface (forward / forward_seq / predict /
StreamingEngine), and `dequantize` recovers a plain-"w" tree for
interop. Training and the fused Pallas path fall back / reject: PTQ
is eval-only by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_absmax_paths(stats_tree) -> Dict[Tuple, float]:
    """Flatten a stats tree returned by a calibrate step into
    {path: absmax} for every conv that reported one."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "in_absmax" in node:
                out[path] = float(node["in_absmax"])
            for k, v in node.items():
                if k != "in_absmax":
                    walk(v, path + (k,))

    walk(stats_tree, ())
    return out


def calibrate(
    model,
    params,
    stats,
    sequences: Iterable[Any],
    max_batches: int | None = None,
) -> Dict[Tuple, float]:
    """Run calibration forwards and collect per-conv input absmax.

    ``sequences`` yields event tensors shaped [T, B, H, W, C] (or a
    single such array). Returns {params-path: absmax} covering every
    conv in the model, folded as a running max across all batches and
    time steps.
    """
    if hasattr(sequences, "ndim"):
        sequences = [sequences]

    step = jax.jit(
        lambda p, s, st, x: model.step(p, s, st, x, calibrate=True)[1:3]
    )
    ranges: Dict[Tuple, float] = {}
    for bi, X in enumerate(sequences):
        if max_batches is not None and bi >= max_batches:
            break
        X = jnp.asarray(X)
        state = model.init_state(X.shape[1])
        for t in range(X.shape[0]):
            new_stats, state = step(params, stats, state, X[t])
            for path, amax in _conv_absmax_paths(
                jax.device_get(new_stats)
            ).items():
                ranges[path] = max(ranges.get(path, 0.0), amax)
    return ranges


def quantize(params, absmax: Dict[Tuple, float]):
    """Quantize every calibrated conv leaf of ``params``.

    Returns a new params pytree where each conv dict on an ``absmax``
    path becomes ``{"w_q": int8 [k,k,cin,cout], "w_scale": f32 [cout],
    "x_scale": f32 scalar}``. Uncalibrated leaves (head tails the
    calibration never reached, ConvLSTM gates, BN) are left in fp.
    """

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        # A conv whose calibration input was all-zero (spikes that
        # never fired in the calibration window) has no usable scale —
        # leave it in fp rather than invent one.
        if absmax.get(path, 0.0) > 0.0 and "w" in node \
                and node["w"].ndim == 4:
            w = np.asarray(node["w"], np.float32)
            w_scale = np.maximum(
                np.abs(w).reshape(-1, w.shape[-1]).max(axis=0), 1e-12
            ) / 127.0
            w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
            x_scale = max(absmax[path], 1e-12) / 127.0
            return {
                "w_q": jnp.asarray(w_q),
                "w_scale": jnp.asarray(w_scale, jnp.float32),
                "x_scale": jnp.float32(x_scale),
            }
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(params, ())


def dequantize(params):
    """Inverse of :func:`quantize` (up to int8 rounding): rebuild a
    plain-"w" params tree for interop (megakernel build, export)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "w_q" in node:
            return {
                "w": (
                    node["w_q"].astype(jnp.float32) * node["w_scale"]
                )
            }
        return {k: walk(v) for k, v in node.items()}

    return walk(params)
