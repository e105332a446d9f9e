"""Spec compiler: DSL config lists -> pure init/apply functions.

This replaces the reference's runtime interpretation of a module tree
(``BlockGen.forward``'s nested Python loops threading ``ListState``,
/root/reference/models/generator.py:169-198) with a *compile step*:

- channel and spatial shape inference runs once here (the analogue of
  generator.py:135-167), so every state tensor has a static shape;
- the result is a :class:`CompiledBlock` of pure closures
  ``apply(params, stats, state, x, ctx) -> (y, stats, state)`` — under
  ``jit`` the whole tree flattens into one XLA computation, and the
  time loop around it is a single ``lax.scan``;
- parameters / BN running stats / neuron states are three parallel
  pytrees (nested string-keyed dicts) mirroring the config structure —
  the checkpoint-serializable analogue of ``ListState``.

Layout is NHWC (channels-last): channels map onto TPU vector lanes and
convolutions hit the MXU without transposes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# int8 PTQ dequant arithmetic width (trace-time constant). The bf16
# chain is the measured default; SNN_INT8_DEQUANT=f32 re-enables the
# round-4 fp32 variant for A/B (benchmarks/bench_int8_ptq.py --both).
_INT8_DEQUANT_F32 = os.environ.get("SNN_INT8_DEQUANT", "bf16") == "f32"

from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.ops import neurons

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass
class Ctx:
    """Per-call context threaded through apply.

    ``train`` is a static Python bool (separate traces for train/eval).
    ``taps`` collects ``Return`` outputs in config order (the analogue
    of ``Storage`` side channels, generator.py:343-351). ``records``
    collects (state, out) per flagged neuron layer when ``record`` is
    on (the analogue of ``StateStorage``, common.py:86-123).
    """

    train: bool = False
    record: bool = False
    taps: List[Array] = dataclasses.field(default_factory=list)
    records: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # Time-batched mode only: [T] bool, step t active iff step_mask[t]
    # (the random-start truncation gate; None = all steps active).
    step_mask: Optional[Array] = None
    # When step_mask is the prefix mask arange(T) >= r, the traced
    # scalar r itself — lets stateful cells use the Pallas temporal
    # kernel's truncation gate instead of the masked scan fallback.
    start_step: Optional[Array] = None
    # Time-batched TRAINING only: wrap compute segments (conv->norm->
    # cell runs, nested blocks) in jax.checkpoint, so BPTT through
    # apply_seq saves only segment-boundary activations instead of
    # every layer's [T, B, H, W, C] output (the seq-mode analogue of
    # the step scan's jax.checkpoint(body), detector.py:470-471).
    remat_seq: bool = False
    # Time-batched mode only: run eligible [Conv3x3 -> BN -> LIF/LI]
    # units as ONE fused temporal Pallas kernel (inference fast path;
    # fp32-accumulation order differs from the XLA conv, so spikes can
    # flip on ~0.2% of near-threshold pixels — opt-in).
    fuse: bool = False
    # int8 PTQ calibration pass (static bool, offline only): every conv
    # reports its input absmax in its returned stats dict under
    # "in_absmax" so ops/quantize.calibrate can collect per-layer
    # activation ranges. Not compatible with lax.scan carries (the
    # stats structure changes), so calibration drives ``model.step``.
    calibrate: bool = False


@dataclasses.dataclass
class CompiledBlock:
    """A compiled sub-network: static shape info + pure closures.

    ``apply`` processes one time step ``x [B, H, W, C]`` (used inside
    the detector's outer ``lax.scan``). ``apply_seq`` processes a whole
    sequence ``X [T, B, H, W, C]`` in *time-batched* mode: stateless
    layers fold T into the batch (one big MXU op per layer for the
    whole sequence, weights read from HBM once instead of once per
    step), and only the elementwise stateful cells run per-layer
    ``lax.scan``s. Same math, reordered — the throughput-optimal
    schedule on TPU. Leaves whose per-step apply is NOT time-invariant
    (stateful cells, train-mode BatchNorm, ``Return`` taps) must
    override ``apply_seq``; the default derives it by batch-folding
    ``apply``, which is only correct for stateless leaves.
    """

    out_channels: int
    out_hw: Tuple[int, int]
    init: Callable[[Array], Params]  # key -> params
    init_stats: Callable[[], Params]
    init_state: Callable[[int], Any]  # batch -> state pytree
    apply: Callable[[Params, Params, Any, Array, Ctx], Tuple[Array, Params, Any]]
    apply_seq: Optional[Callable] = None
    # leaf descriptor for cross-layer fusion in seq mode, e.g.
    # ("conv", k, s) / ("norm", eps) / ("cell", "lif", record) /
    # ("block",) for compiled sub-blocks / ("tap",) for Return leaves
    meta: Optional[Tuple] = None
    # True if this block (or any nested layer) appends to ctx.taps —
    # such layers must run OUTSIDE jax.checkpoint segments (the tap
    # list is a trace-time side channel; a checkpointed body would
    # leak inner tracers into it).
    has_tap: bool = False

    def __post_init__(self):
        if self.apply_seq is None:
            self.apply_seq = _fold_time_into_batch(self.apply)


def _fold_time_into_batch(apply):
    """Sequence apply for a time-invariant (stateless) leaf: fold
    [T, B, ...] -> [T*B, ...], run the single-step apply once."""

    def apply_seq(params, stats, state, X, ctx):
        t, b = X.shape[0], X.shape[1]
        y, stats, state = apply(
            params, stats, state, X.reshape((t * b,) + X.shape[2:]), ctx
        )
        return y.reshape((t, b) + y.shape[1:]), stats, state

    return apply_seq


def _masked_state(new, old, keep):
    """Gate a state update by the per-step truncation mask."""
    if keep is None:
        return new
    return jax.tree.map(lambda n, o: jnp.where(keep, n, o), new, old)


def _bn_eval_coeffs(params, stats, eps):
    """Eval-mode BatchNorm folded to per-channel (k, b) fp32 vectors:
    ``y = x * k + b``. Single source of truth for every consumer (the
    Norm leaf's eval paths and the fused Pallas plan)."""
    k = jax.lax.rsqrt(stats["var"] + eps) * params["scale"]
    b = -stats["mean"] * k
    if "bias" in params:
        b = b + params["bias"]
    return k, b


def _bn_eval_affine(params, stats, x, eps):
    """Eval-mode BatchNorm as one folded affine applied in the
    activation dtype."""
    k, b = _bn_eval_coeffs(params, stats, eps)
    return x * k.astype(x.dtype) + b.astype(x.dtype)


def _cell_apply_seq(cell, state_dtype, record, name, pallas_cell=None):
    """Sequence apply for an elementwise stateful cell: a per-layer
    ``lax.scan`` over T whose carry is ONLY this cell's state (the
    surrounding convs already ran time-batched).

    ``cell(params, x_fp32, state_fp32) -> (out, new_state)``.

    For plain LIF/LI cells (``pallas_cell`` set), the whole time loop
    runs as ONE Pallas kernel with (v, i) resident in VMEM
    (ops/pallas_kernels.temporal_cell_seq) whenever no recording is
    requested and the truncation mask (if any) is the prefix gate the
    kernel understands (``ctx.start_step``); numerics are bit-identical
    to the scan.
    """

    def apply_seq(params, stats, state, X, ctx):
        keep = ctx.step_mask
        want_rec = record and ctx.record

        if (
            pallas_cell is not None and not want_rec and X.ndim >= 3
            and (keep is None or ctx.start_step is not None)
        ):
            from snn_for_object_detection_tpu.ops import pallas_kernels

            z, v_t, i_t = pallas_kernels.temporal_cell_seq(
                X, state.v, state.i, cell=pallas_cell,
                start=0 if ctx.start_step is None else ctx.start_step,
            )
            return z, stats, type(state)(v_t, i_t)

        xs = (X, keep) if keep is not None else (X,)

        def body(st, inp):
            x_t = inp[0]
            st32 = jax.tree.map(lambda a: a.astype(jnp.float32), st)
            out, upd = cell(params, x_t.astype(jnp.float32), st32)
            upd = jax.tree.map(lambda a: a.astype(state_dtype), upd)
            if keep is not None:
                upd = _masked_state(upd, st, inp[1])
            out = out.astype(X.dtype)
            return upd, (out, upd) if want_rec else out

        state, ys = jax.lax.scan(body, state, xs)
        if want_rec:
            out_seq, state_seq = ys
            ctx.records[name] = (state_seq, out_seq)
        else:
            out_seq = ys
        return out_seq, stats, state

    return apply_seq


def _empty_init(_key):
    return {}


def _empty_stats():
    return {}


def _empty_state(_b):
    return ()


def _passthrough(fn):
    """Wrap a stateless, param-less array fn into the apply protocol."""

    def apply(params, stats, state, x, ctx):
        return fn(x), stats, state

    return apply


def _kaiming_conv_init(key, shape):
    """Kaiming-normal, fan_out mode, relu gain — matching the
    reference's conv init (generator.py:245-252). shape is HWIO."""
    kh, kw, _, out = shape
    std = (2.0 / (kh * kw * out)) ** 0.5
    return std * jax.random.normal(key, shape, jnp.float32)


def _conv2d(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_out_hw(hw, k, s, p):
    return tuple((d + 2 * p - k) // s + 1 for d in hw)


def _s2d_pack_x(x):
    """[..., H, W, C] -> [..., H/2, W/2, 4C]: 2x2 space-to-depth with
    the row phase ``a`` outermost in the packed channel index
    (``a*2C + b*C + c``), matching :func:`_s2d_pack_w`."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = jnp.swapaxes(x, -4, -3)  # [..., H/2, W/2, a, b, C]
    return x.reshape(*lead, H // 2, W // 2, 4 * C)


def _s2d_pack_w(w):
    """[3, 3, C, O] -> [2, 2, 4C, O]: scatter the 3x3 stride-2 taps
    onto the packed-grid kernel. With output row i, raw rows
    2i-1/2i/2i+1 live at packed rows (i-1, phase 1), (i, phase 0),
    (i, phase 1) — a kernel-2 stride-1 conv with top/left padding 1;
    the (packed tap 0, phase 0) slot (raw offset -2) is never read and
    stays zero. Same for columns."""
    C, O = w.shape[2], w.shape[3]
    wp = jnp.zeros((2, 2, 2, 2, C, O), w.dtype)  # [DI, DJ, a, b, C, O]
    m = {(0, 1): 0, (1, 0): 1, (1, 1): 2}  # (packed tap, phase) -> raw tap
    for (di_p, a), di in m.items():
        for (dj_p, b), dj in m.items():
            wp = wp.at[di_p, dj_p, a, b].set(w[di, dj])
    return wp.reshape(2, 2, 4 * C, O)


# ---------------------------------------------------------------------------
# Leaf compilation
# ---------------------------------------------------------------------------


def _compile_leaf(
    layer: S.LayerSpec, in_ch: int, in_hw: Tuple[int, int], name: str,
    state_dtype=jnp.float32,
) -> CompiledBlock:
    h, w = in_hw

    if isinstance(layer, S.Pass):
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(lambda x: x),
        )

    if isinstance(layer, S.Conv):
        out = in_ch if layer.out_channels is None else layer.out_channels
        k, s = layer.kernel_size, layer.stride
        pad = k // 2
        out_hw = _conv_out_hw(in_hw, k, s, pad)

        s2d = layer.s2d
        if s2d:
            if k != 3 or s != 2:
                raise ValueError(
                    f"{name}: Conv(s2d=True) requires kernel_size=3 "
                    f"stride=2, got k={k} s={s}"
                )
            if h % 2 or w % 2:
                raise ValueError(
                    f"{name}: Conv(s2d=True) needs even input dims, "
                    f"got {in_hw}"
                )

        def conv_plan(x, wt, s=s, pad=pad):
            """(x, w, strides, padding) under the selected execution
            plan — packed space-to-depth or the plain conv."""
            if s2d:
                return (_s2d_pack_x(x), _s2d_pack_w(wt), (1, 1),
                        [(1, 0), (1, 0)])
            return x, wt, (s, s), [(pad, pad), (pad, pad)]

        def init(key, k=k, in_ch=in_ch, out=out):
            return {"w": _kaiming_conv_init(key, (k, k, in_ch, out))}

        def apply(params, stats, state, x, ctx, s=s, pad=pad):
            if "w_q" in params:
                # int8 PTQ path (ops/quantize.py): per-tensor input
                # scale, per-output-channel weight scale, int8xint8 ->
                # int32 conv on the MXU. The quant chain stays in the
                # activation dtype (mul+round+clip+cast fuse into ONE
                # elementwise pass; TPU convs are custom-calls, so
                # these passes cannot fuse into the conv itself and
                # their byte traffic is the whole PTQ overhead).
                inv = (1.0 / params["x_scale"]).astype(x.dtype)
                q_x = jnp.clip(
                    jnp.round(x * inv), -127, 127
                ).astype(jnp.int8)
                q_x, w_q, strides, padding = conv_plan(q_x, params["w_q"])
                y = jax.lax.conv_general_dilated(
                    q_x, w_q,
                    window_strides=strides,
                    padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                scale = params["x_scale"] * params["w_scale"]
                if _INT8_DEQUANT_F32:
                    # fp32 dequant (int32 acc × f32 scale, cast last):
                    # round-4's "precision fix". Chip A/B
                    # (log/chip_r05/int8_ab_f32.log): 0.847× the fp
                    # baseline AND mAP50 −0.054 — strictly worse than
                    # the bf16 chain on both axes. Kept only as the
                    # A/B arm.
                    return (y * scale).astype(x.dtype), stats, state
                # bf16 dequant (cast the int32 accumulator to the
                # activation dtype first, multiply by a bf16 scale) —
                # the round-3 shipped form, re-pinned by the round-5
                # chip A/B (log/chip_r05/int8_ab_bf16.log): 1.082×
                # speedup, mAP50 delta −0.003 (inside the ±0.02
                # run-to-run eval noise). The conv is a custom call,
                # so the dequant is its own elementwise pass either
                # way; keeping every operand in the activation dtype
                # lets XLA fuse it with the downstream BN-affine/
                # neuron pass instead of materializing an f32
                # intermediate (the f32 chain measured 0.95× in
                # round 3 and 0.85× in rounds 4-5).
                return (
                    y.astype(x.dtype) * scale.astype(x.dtype),
                    stats, state,
                )
            if ctx.calibrate:
                stats = dict(stats)
                stats["in_absmax"] = jnp.max(
                    jnp.abs(x.astype(jnp.float32))
                )
            xp, wt, strides, padding = conv_plan(x, params["w"])
            y = jax.lax.conv_general_dilated(
                xp,
                wt.astype(x.dtype),
                window_strides=strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y, stats, state

        return CompiledBlock(out, out_hw, init, _empty_stats, _empty_state,
                             apply, meta=("conv", k, s))

    if isinstance(layer, S.Norm):
        def init(key, ch=in_ch, bias=layer.bias):
            p = {"scale": jnp.ones((ch,), jnp.float32)}
            if bias:
                p["bias"] = jnp.zeros((ch,), jnp.float32)
            return p

        def init_stats(ch=in_ch):
            return {
                "mean": jnp.zeros((ch,), jnp.float32),
                "var": jnp.ones((ch,), jnp.float32),
            }

        eps, momentum = layer.eps, layer.momentum

        def apply(params, stats, state, x, ctx):
            xf = x.astype(jnp.float32)
            if ctx.train:
                # Per-step batch stats over (B, H, W). Under pjit with a
                # batch-sharded mesh this mean is a global (cross-
                # replica) reduction — sync-BN for free (SURVEY.md §2.3).
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.var(xf, axis=(0, 1, 2))
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                new_stats = {
                    "mean": (1 - momentum) * stats["mean"] + momentum * mean,
                    "var": (1 - momentum) * stats["var"] + momentum * unbiased,
                }
            else:
                # Eval: running stats are constants — fold into a single
                # affine in the compute dtype. Keeping the math out of
                # fp32 avoids materializing fp32-sized activations
                # (measured 2.5x on the time-batched path).
                return _bn_eval_affine(params, stats, x, eps), stats, state
            y = (xf - mean) * jax.lax.rsqrt(var + eps) * params["scale"]
            if "bias" in params:
                y = y + params["bias"]
            return y.astype(x.dtype), new_stats, state

        def apply_seq(params, stats, state, X, ctx):
            xf = X.astype(jnp.float32)
            if ctx.train:
                # Per-step batch stats over (B, H, W) for each t —
                # identical values to the step path, computed in one
                # batched reduction; only the tiny [C]-vector running-
                # stat fold stays sequential (and truncation-gated).
                mean = jnp.mean(xf, axis=(1, 2, 3))  # [T, C]
                var = jnp.var(xf, axis=(1, 2, 3))
                n = X.shape[1] * X.shape[2] * X.shape[3]
                unbiased = var * (n / max(n - 1, 1))
                keep = ctx.step_mask
                if keep is None:
                    keep = jnp.ones((X.shape[0],), bool)

                def fold(s, inp):
                    m_t, v_t, k_t = inp
                    upd = {
                        "mean": (1 - momentum) * s["mean"] + momentum * m_t,
                        "var": (1 - momentum) * s["var"] + momentum * v_t,
                    }
                    return _masked_state(upd, s, k_t), None

                new_stats, _ = jax.lax.scan(
                    fold, stats, (mean, unbiased, keep)
                )
                mean = mean[:, None, None, None, :]
                var = var[:, None, None, None, :]
            else:
                return _bn_eval_affine(params, stats, X, eps), stats, state
            y = (xf - mean) * jax.lax.rsqrt(var + eps) * params["scale"]
            if "bias" in params:
                y = y + params["bias"]
            return y.astype(X.dtype), new_stats, state

        return CompiledBlock(in_ch, in_hw, init, init_stats, _empty_state,
                             apply, apply_seq=apply_seq, meta=("norm", eps))

    if isinstance(layer, S.Pool):
        k = layer.kernel_size
        s = layer.stride if layer.stride is not None else k
        oh, ow = (h - k) // s + 1, (w - k) // s + 1
        out_hw = (oh, ow)

        # Note: generic lax.reduce_window has no linearization rule
        # under jax.checkpoint (the scan body is remat-ed for BPTT), so
        # pooling is expressed via reshape reductions (k == s, the only
        # configuration the reference uses, layer_gen.py:146-173) or a
        # depthwise conv — both fully differentiable and MXU/VPU-
        # friendly.
        if s == k:
            def pool_apply(x, k=k, oh=oh, ow=ow, kind=layer.type):
                b, _, _, c = x.shape
                x = x[:, : oh * k, : ow * k, :]
                x = x.reshape(b, oh, k, ow, k, c)
                if kind == "M":
                    return jnp.max(x, axis=(2, 4))
                y = jnp.sum(x, axis=(2, 4))
                return y / (k * k) if kind == "A" else y
        elif layer.type in ("A", "S"):
            def pool_apply(x, k=k, s=s, kind=layer.type, c=in_ch):
                kernel = jnp.ones((k, k, 1, 1), x.dtype)
                y = jax.lax.conv_general_dilated(
                    x, jnp.broadcast_to(kernel, (k, k, 1, c)),
                    (s, s), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                )
                return y / (k * k) if kind == "A" else y
        else:
            # Max pool with stride != kernel: elementwise max over the
            # k*k shifted strided slices. Unlike lax.reduce_window this
            # has a linearization rule (plain jnp.maximum), so it stays
            # differentiable under the jax.checkpoint-ed scan body.
            def pool_apply(x, k=k, s=s, oh=oh, ow=ow):
                y = None
                for di in range(k):
                    for dj in range(k):
                        sl = x[:, di : di + (oh - 1) * s + 1 : s,
                               dj : dj + (ow - 1) * s + 1 : s, :]
                        y = sl if y is None else jnp.maximum(y, sl)
                return y

        return CompiledBlock(
            in_ch, out_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(pool_apply),
        )

    if isinstance(layer, S.Up):
        # Mode surface mirrors the reference's nn.Upsample pass-through
        # (layer_gen.py:176-193): nearest / linear / bilinear / bicubic /
        # trilinear. On a 2-D map the (tri)linear variants all mean
        # bilinear; interpolating modes use half-pixel centers
        # (= torch align_corners=False). torch's bicubic uses the Keys
        # kernel with a=-0.75 vs JAX's a=-0.5 — boundary taps can differ
        # in the 3rd decimal; documented, not matched.
        scale = layer.scale
        out_hw = (h * scale, w * scale)
        if layer.mode == "nearest":
            # Integer-scale nearest == repeat (exactly torch's floor
            # indexing), cheaper than a gather-based resize.
            def up_apply(x, scale=scale):
                y = jnp.repeat(x, scale, axis=1)
                return jnp.repeat(y, scale, axis=2)
        elif layer.mode in ("linear", "bilinear", "trilinear", "bicubic"):
            method = "cubic" if layer.mode == "bicubic" else "linear"

            def up_apply(x, out_hw=out_hw, method=method):
                return jax.image.resize(
                    x, (x.shape[0],) + out_hw + (x.shape[3],), method
                ).astype(x.dtype)
        else:
            raise NotImplementedError(f"Up mode {layer.mode!r}")

        return CompiledBlock(
            in_ch, out_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(up_apply),
        )

    if isinstance(layer, S.ReLU):
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(jax.nn.relu),
        )
    if isinstance(layer, S.SiLU):
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(jax.nn.silu),
        )
    if isinstance(layer, S.Tanh):
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, _empty_state,
            _passthrough(jnp.tanh),
        )

    if isinstance(layer, S.PLIF):
        def init(key, ch=in_ch):
            p = neurons.plif_params_init(ch)
            return {"raw_tau_syn": p.raw_tau_syn, "raw_tau_mem": p.raw_tau_mem}

        def init_state(b, ch=in_ch, hw=in_hw):
            return neurons.lif_init((b, hw[0], hw[1], ch), dtype=state_dtype)

        record = layer.state_storage

        def apply(params, stats, state, x, ctx, record=record, name=name):
            learn = neurons.PLIFParams(
                params["raw_tau_syn"], params["raw_tau_mem"]
            )
            state32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
            out, new_state = neurons.plif_step(
                x.astype(jnp.float32), state32, learn
            )
            new_state = jax.tree.map(lambda a: a.astype(state_dtype), new_state)
            if record and ctx.record:
                ctx.records[name] = (new_state, out)
            return out.astype(x.dtype), stats, new_state

        def plif_cell(params, x, st):
            learn = neurons.PLIFParams(
                params["raw_tau_syn"], params["raw_tau_mem"]
            )
            return neurons.plif_step(x, st, learn)

        apply_seq = _cell_apply_seq(plif_cell, state_dtype, record, name)
        return CompiledBlock(in_ch, in_hw, init, _empty_stats, init_state,
                             apply, apply_seq=apply_seq)

    if isinstance(layer, S.ALIF):
        ap = neurons.ALIFParams(
            beta=layer.beta, tau_adapt_inv=layer.tau_adapt_inv
        )

        def init_state(b, ch=in_ch, hw=in_hw, ap=ap):
            return neurons.alif_init((b, hw[0], hw[1], ch), dtype=state_dtype,
                                     p=ap)

        record = layer.state_storage

        def apply(params, stats, state, x, ctx, ap=ap, record=record,
                  name=name):
            state32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
            out, new_state = neurons.alif_step(
                x.astype(jnp.float32), state32, ap
            )
            new_state = jax.tree.map(lambda a: a.astype(state_dtype), new_state)
            if record and ctx.record:
                ctx.records[name] = (new_state, out)
            return out.astype(x.dtype), stats, new_state

        apply_seq = _cell_apply_seq(
            lambda _p, x, st, ap=ap: neurons.alif_step(x, st, ap),
            state_dtype, record, name,
        )
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, init_state, apply,
            apply_seq=apply_seq,
        )

    if isinstance(layer, (S.LIF, S.LI, S.SLI, S.Synapse)):
        if isinstance(layer, S.LIF):
            cell_init, cell_step = neurons.lif_init, neurons.lif_step
        elif isinstance(layer, S.LI):
            cell_init, cell_step = neurons.li_init, neurons.li_step
        elif isinstance(layer, S.SLI):
            cell_init, cell_step = neurons.sli_init, neurons.sli_step
        else:
            p = neurons.SynapseParams(sigma_inhibition=layer.sigma_inhibition)
            cell_init = lambda shape, dtype=jnp.float32: neurons.synapse_init(
                shape, dtype, p
            )
            cell_step = lambda x, st: neurons.synapse_step(x, st, p)

        record = getattr(layer, "state_storage", False)

        def init_state(b, ch=in_ch, hw=in_hw, cell_init=cell_init):
            return cell_init((b, hw[0], hw[1], ch), dtype=state_dtype)

        def apply(params, stats, state, x, ctx, cell_step=cell_step,
                  record=record, name=name):
            # Update math runs in fp32; storage dtype is configurable
            # (bf16 halves the dominant HBM traffic of the LIF chain).
            state32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
            out, new_state = cell_step(x.astype(jnp.float32), state32)
            new_state = jax.tree.map(lambda a: a.astype(state_dtype), new_state)
            if record and ctx.record:
                ctx.records[name] = (new_state, out)
            return out.astype(x.dtype), stats, new_state

        if isinstance(layer, S.LIF):
            pallas_cell = "lif"
        elif isinstance(layer, S.LI):
            pallas_cell = "li"
        else:
            pallas_cell = None
        apply_seq = _cell_apply_seq(
            lambda _p, x, st, cell_step=cell_step: cell_step(x, st),
            state_dtype, record, name, pallas_cell=pallas_cell,
        )
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, init_state, apply,
            apply_seq=apply_seq,
            meta=("cell", pallas_cell, record) if pallas_cell else None,
        )

    if isinstance(layer, S.LSTM):
        hidden = in_ch if layer.hidden_size is None else layer.hidden_size
        k = layer.kernel_size
        # Same-padding keeps out_hw == in_hw for any kernel. The
        # reference only ever instantiates k=1 and its unpadded conv
        # would desync the carried hidden state for k>1
        # (conv_lstm.py:20,37-41: cat([X, h]) fails at step 2) — the
        # padded form is the working generalization.
        pad = k // 2

        def init(key, k=k, in_ch=in_ch, hidden=hidden):
            return {"w": _kaiming_conv_init(key, (k, k, in_ch + hidden, 4 * hidden))}

        def init_state(b, hw=in_hw, hidden=hidden):
            shape = (b, hw[0], hw[1], hidden)
            return (jnp.zeros(shape, state_dtype), jnp.zeros(shape, state_dtype))

        def apply(params, stats, state, x, ctx, pad=pad):
            # Gate math mirrors conv_lstm.py:63-78 (order: i, f, o, g).
            h_prev, c_prev = state
            combined = jnp.concatenate([x, h_prev.astype(x.dtype)], axis=-1)
            gates = _conv2d(combined, params["w"], 1, pad).astype(jnp.float32)
            i_g, f_g, o_g, g_g = jnp.split(gates, 4, axis=-1)
            c_new = (
                jax.nn.sigmoid(f_g) * c_prev.astype(jnp.float32)
                + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            )
            h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
            return h_new.astype(x.dtype), stats, (
                h_new.astype(state_dtype), c_new.astype(state_dtype)
            )

        def apply_seq(params, stats, state, X, ctx):
            # ConvLSTM's conv consumes the carried h, so the conv cannot
            # leave the scan; the scan body is the step apply itself.
            keep = ctx.step_mask
            xs = (X, keep) if keep is not None else (X,)

            def body(st, inp):
                y, _, upd = apply(params, stats, st, inp[0], ctx)
                if keep is not None:
                    upd = _masked_state(upd, st, inp[1])
                return upd, y

            state, Y = jax.lax.scan(body, state, xs)
            return Y, stats, state

        return CompiledBlock(hidden, in_hw, init, _empty_stats, init_state,
                             apply, apply_seq=apply_seq)

    if isinstance(layer, S.Return):
        def apply(params, stats, state, x, ctx):
            ctx.taps.append(x)
            return x, stats, state

        # In time-batched mode the tap is the whole [T, B, ...] sequence.
        return CompiledBlock(
            in_ch, in_hw, _empty_init, _empty_stats, _empty_state, apply,
            apply_seq=apply, meta=("tap",), has_tap=True,
        )

    raise TypeError(f"Unknown layer spec: {layer!r}")


# ---------------------------------------------------------------------------
# Block compilation (recursive)
# ---------------------------------------------------------------------------


def compile_block(
    cfgs,
    in_ch: int,
    in_hw: Tuple[int, int],
    name: str = "",
    returns: Optional[List[Tuple[int, Tuple[int, int]]]] = None,
    state_dtype=jnp.float32,
) -> CompiledBlock:
    """Recursively compile a config list into a :class:`CompiledBlock`.

    Mirrors ``BlockGen.__init__`` (generator.py:82-143): a ``Residual``
    / ``Dense`` instance is a list of branches; a plain list is a
    single sequential branch. Nested lists recurse.

    :param returns: When given, ``Return`` leaf (channels, hw) pairs are
        appended in config order (``NeckGen.out_shape`` analogue).
    """
    if isinstance(cfgs, S.Residual):
        mode, branch_cfgs = "residual", list(cfgs)
    elif isinstance(cfgs, S.Dense):
        mode, branch_cfgs = "dense", list(cfgs)
    else:
        mode, branch_cfgs = "plain", [list(cfgs)]

    branches: List[List[CompiledBlock]] = []
    out_channels = 0
    out_hw: Optional[Tuple[int, int]] = None

    for bi, branch_cfg in enumerate(branch_cfgs):
        layers: List[CompiledBlock] = []
        ch, hw = in_ch, in_hw
        for li, element in enumerate(branch_cfg):
            lname = f"{name}/b{bi}/l{li}" if name else f"b{bi}/l{li}"
            if isinstance(element, S.LayerSpec):
                compiled = _compile_leaf(element, ch, hw, lname, state_dtype)
                if isinstance(element, S.Return) and returns is not None:
                    returns.append((ch, hw))
            elif isinstance(element, (list, tuple)):
                compiled = compile_block(
                    element, ch, hw, lname, returns, state_dtype
                )
            else:
                raise TypeError(f"Bad config element at {lname}: {element!r}")
            layers.append(compiled)
            ch, hw = compiled.out_channels, compiled.out_hw
        branches.append(layers)

        if mode == "residual":
            if out_channels and out_channels != ch:
                raise ValueError(
                    "Residual branch channel mismatch: "
                    f"{out_channels} vs {ch} at {name!r}"
                )
            out_channels = ch
        elif mode == "dense":
            out_channels += ch
        else:
            out_channels = ch
        if mode in ("residual", "dense"):
            if out_hw is not None and out_hw != hw:
                raise ValueError(
                    f"Branch spatial mismatch: {out_hw} vs {hw} at {name!r}"
                )
        out_hw = hw

    def init(key):
        params = {}
        for bi, layers in enumerate(branches):
            keys = jax.random.split(key, len(layers) + 1)
            key = keys[0]
            params[f"b{bi}"] = {
                f"l{li}": layer.init(keys[li + 1])
                for li, layer in enumerate(layers)
            }
        return params

    def init_stats():
        return {
            f"b{bi}": {
                f"l{li}": layer.init_stats() for li, layer in enumerate(layers)
            }
            for bi, layers in enumerate(branches)
        }

    def init_state(b):
        return {
            f"b{bi}": {
                f"l{li}": layer.init_state(b) for li, layer in enumerate(layers)
            }
            for bi, layers in enumerate(branches)
        }

    def _fused_groups(layers):
        """Indices of [Conv kxk (k in {1,3}, stride in {1,2}) -> Norm
        -> LIF/LI] triples eligible for the fused temporal Pallas
        kernel (seq mode, eval only) — the full spiking-conv menu of
        the flagship architecture: 3x3 s1 trunk convs, 3x3 s2
        downsamples, 1x1 C2f projections."""
        groups = {}
        li = 0
        while li + 2 < len(layers):
            m0, m1, m2 = (layers[li].meta, layers[li + 1].meta,
                          layers[li + 2].meta)
            if (
                m0 is not None and m0[0] == "conv"
                and m0[1] in (1, 3) and m0[2] in (1, 2)
                and m1 is not None and m1[0] == "norm"
                and m2 is not None and m2[0] == "cell"
            ):
                # eps, cell, record, stride
                groups[li] = (m1[1], m2[1], m2[2], m0[2])
                li += 3
            else:
                li += 1
        return groups

    def _run_fused(layers, li, eps, cell, stride, params_b, stats_b,
                   state_b, X):
        from snn_for_object_detection_tpu.ops import pallas_kernels

        a, b = _bn_eval_coeffs(
            params_b[f"l{li + 1}"], stats_b[f"l{li + 1}"], eps
        )
        st = state_b[f"l{li + 2}"]
        z, v_t, i_t = pallas_kernels.spiking_conv_seq(
            X, params_b[f"l{li}"]["w"].astype(X.dtype), a, b,
            st.v, st.i, cell=cell, stride=stride,
        )
        return z, type(st)(v_t, i_t)

    def _segment_plan(layers):
        """Compile-time grouping of a branch into jax.checkpoint
        segments for seq-mode training remat (ctx.remat_seq). A
        segment closes after each stateful cell or nested block — the
        activation-heavy boundaries — so backward saves only one
        [T, B, H, W, C] tensor per conv->norm->cell run instead of one
        per layer. Tap layers (Return) run bare: ctx.taps appends are
        trace-time side channels that must stay outside the
        checkpointed body."""
        plan = []
        cur: List[int] = []
        for li, layer in enumerate(layers):
            if layer.has_tap:
                if cur:
                    plan.append(("seg", cur, _make_seg_runner(layers, cur)))
                    cur = []
                plan.append(("bare", [li], None))
                continue
            cur.append(li)
            if layer.meta is not None and layer.meta[0] in ("cell", "block"):
                plan.append(("seg", cur, _make_seg_runner(layers, cur)))
                cur = []
        if cur:
            plan.append(("seg", cur, _make_seg_runner(layers, cur)))
        return plan

    def _make_seg_runner(layers, idxs):
        def run(y, ps, ss, sts, ictx):
            new_s, new_st = [], []
            for li, p, s, st in zip(idxs, ps, ss, sts):
                y, s2, st2 = layers[li].apply_seq(p, s, st, y, ictx)
                new_s.append(s2)
                new_st.append(st2)
            return y, tuple(new_s), tuple(new_st)

        return run

    def _make_apply(seq: bool):
        fused_plans = [_fused_groups(layers) for layers in branches] if seq \
            else [{} for _ in branches]
        seg_plans = [_segment_plan(layers) for layers in branches] if seq \
            else None

        def _apply_branch_remat(layers, plan, p_b, s_b, st_b, x, ctx,
                                b_stats, b_state):
            # Training remat path: params/stats/state enter each
            # segment as EXPLICIT jax.checkpoint args (gradients only
            # flow to explicit arguments); ctx is closed over — its
            # only traced field (step_mask/start_step) needs no grad.
            # Inner layers see remat_seq=False so nested blocks don't
            # re-wrap (one remat level = one forward recompute).
            ictx = dataclasses.replace(ctx, remat_seq=False)
            y = x
            for kind, idxs, runner in plan:
                if kind == "bare":
                    li = idxs[0]
                    y, s2, st2 = layers[li].apply_seq(
                        p_b[f"l{li}"], s_b[f"l{li}"], st_b[f"l{li}"], y,
                        ctx,
                    )
                    b_stats[f"l{li}"] = s2
                    b_state[f"l{li}"] = st2
                    continue
                ps = tuple(p_b[f"l{li}"] for li in idxs)
                ss = tuple(s_b[f"l{li}"] for li in idxs)
                sts = tuple(st_b[f"l{li}"] for li in idxs)
                y, new_ss, new_sts = jax.checkpoint(
                    lambda y, ps, ss, sts, run=runner: run(
                        y, ps, ss, sts, ictx
                    )
                )(y, ps, ss, sts)
                for li, s2, st2 in zip(idxs, new_ss, new_sts):
                    b_stats[f"l{li}"] = s2
                    b_state[f"l{li}"] = st2
            return y

        def apply(params, stats, state, x, ctx):
            outs = []
            new_stats = {}
            new_state = {}
            for bi, layers in enumerate(branches):
                y = x
                b_stats = {}
                b_state = {}
                plan = fused_plans[bi]
                p_b = params[f"b{bi}"]
                s_b = stats[f"b{bi}"]
                st_b = state[f"b{bi}"]
                if seq and ctx.remat_seq:
                    y = _apply_branch_remat(
                        layers, seg_plans[bi], p_b, s_b, st_b, x, ctx,
                        b_stats, b_state,
                    )
                    outs.append(y)
                    new_stats[f"b{bi}"] = b_stats
                    new_state[f"b{bi}"] = b_state
                    continue
                li = 0
                while li < len(layers):
                    grp = plan.get(li) if (
                        ctx.fuse and not ctx.train and ctx.step_mask is None
                        # int8-PTQ convs (no "w" key) can't feed the
                        # fused fp kernel — fall through to per-layer
                        and "w" in p_b[f"l{li}"]
                    ) else None
                    if grp is not None and not (grp[2] and ctx.record):
                        eps, cell, _, stride = grp
                        y, cell_state = _run_fused(
                            layers, li, eps, cell, stride, p_b, s_b,
                            st_b, y
                        )
                        b_stats[f"l{li}"] = s_b[f"l{li}"]
                        b_stats[f"l{li + 1}"] = s_b[f"l{li + 1}"]
                        b_stats[f"l{li + 2}"] = s_b[f"l{li + 2}"]
                        b_state[f"l{li}"] = st_b[f"l{li}"]
                        b_state[f"l{li + 1}"] = st_b[f"l{li + 1}"]
                        b_state[f"l{li + 2}"] = cell_state
                        li += 3
                        continue
                    layer = layers[li]
                    fn = layer.apply_seq if seq else layer.apply
                    y, s2, st2 = fn(
                        p_b[f"l{li}"], s_b[f"l{li}"], st_b[f"l{li}"], y, ctx
                    )
                    b_stats[f"l{li}"] = s2
                    b_state[f"l{li}"] = st2
                    li += 1
                outs.append(y)
                new_stats[f"b{bi}"] = b_stats
                new_state[f"b{bi}"] = b_state
            if mode == "residual":
                y = outs[0]
                for o in outs[1:]:
                    y = y + o
            elif mode == "dense":
                y = jnp.concatenate(outs, axis=-1)
            else:
                y = outs[0]
            return y, new_stats, new_state

        return apply

    return CompiledBlock(
        out_channels, out_hw, init, init_stats, init_state,
        _make_apply(False), apply_seq=_make_apply(True), meta=("block",),
        has_tap=any(l.has_tap for ls in branches for l in ls),
    )
