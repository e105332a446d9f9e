"""Whole-network B=1 streaming megakernel (Pallas).

The streaming path's per-frame latency is dominated by glue, not math:
at batch 1 a TinyYolo frame is ~100 small XLA kernels, each paying
dispatch/layout/HBM-roundtrip overheads. This module compiles the
WHOLE detector forward — backbone, neck, per-scale head stems and
tails — into ONE Pallas program: every weight, folded BN coefficient
and recurrent (v, i) state lives in VMEM for the duration of the
frame, activations never leave the chip, and HBM sees exactly one
frame in and a handful of prediction/state tensors out. (TPU v5e VMEM
is large enough for the flagship's ~8 MB of bf16 weights + ~40 MB of
B=1 neuron state.)

Design: the model's spec tree (models/spec.py) is walked with the SAME
traversal/naming rules as the XLA compiler (models/compile.py
``compile_block``), but instead of per-layer closures it emits one
pure ``body(x, params, states) -> (head_outs, new_states)`` function
of jnp values. That body is executed two ways:

- inside a single-program ``pallas_call`` whose inputs/outputs are
  full-array VMEM blocks (the production streaming step), and
- directly under jit (the XLA fallback — also the differential test
  oracle, ``tests/test_megakernel.py``).

Supported layer menu: Conv (k in {1,3}, stride in {1,2}), Norm (folded
eval BN), LIF, LI, ReLU, SiLU, Tanh, Pass, Return, Pool (k == stride),
Up (nearest), Residual / Dense nesting — the whole flagship family.
Models using SLI / Synapse / ConvLSTM / PLIF / ALIF raise
:class:`UnsupportedLayer`; callers fall back to ``model.predict``.

Eval-mode only (folded BN, no surrogate gradients): this is the
serving path of the reference's streaming promise (soda.py:202-233).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.models.compile import _bn_eval_coeffs
from snn_for_object_detection_tpu.ops import neurons


class UnsupportedLayer(ValueError):
    """Spec contains a layer the megakernel cannot express."""


@dataclasses.dataclass
class _StateSlot:
    path: Tuple[str, ...]   # e.g. ("backbone", "b0", "l2")
    field: int              # index within the state namedtuple (v=0, i=1)
    shape: Tuple[int, ...]  # [H, W, C] (B=1, squeezed)
    dtype: Any


class _Builder:
    """Collects parameter arrays and state slots while the spec walk
    emits the body function."""

    def __init__(self, model, params, stats):
        self.model = model
        self.compute_dtype = model.compute_dtype
        self.state_dtype = model.state_dtype
        self.params_tree = params
        self.stats_tree = stats
        self.param_vals: List[jax.Array] = []
        self.state_slots: List[_StateSlot] = []

    # ---- tree lookups by compile-path ("backbone/b0/l0") ----

    def _lookup(self, tree, path: Tuple[str, ...]):
        node = tree
        for p in path:
            node = node[p]
        return node

    def add_param(self, value) -> int:
        self.param_vals.append(value)
        return len(self.param_vals) - 1

    def add_state(self, path, field, shape, dtype) -> int:
        self.state_slots.append(_StateSlot(path, field, shape, dtype))
        return len(self.state_slots) - 1


def _pad_hw(y, pad):
    """Zero-pad H and W via concatenation (jnp.pad is not guaranteed to
    lower inside Mosaic; concat is)."""
    if pad == 0:
        return y
    h, w, c = y.shape
    zr = jnp.zeros((pad, w, c), y.dtype)
    y = jnp.concatenate([zr, y, zr], axis=0)
    zc = jnp.zeros((h + 2 * pad, pad, c), y.dtype)
    return jnp.concatenate([zc, y, zc], axis=1)


def _conv_taps(y, w_taps, k, stride, out_hw, cout):
    """kxk conv as k*k tap matmuls accumulated in fp32; y is [H, W, C]
    (already padded), w_taps is [k*k, Cin, Cout]."""
    ho, wo = out_hw
    cin = y.shape[-1]
    acc = None
    for dy in range(k):
        for dx in range(k):
            if stride == 1:
                patch = y[dy:dy + ho, dx:dx + wo, :]
            else:
                patch = y[
                    dy:dy + (ho - 1) * stride + 1:stride,
                    dx:dx + (wo - 1) * stride + 1:stride,
                    :,
                ]
            m = jnp.dot(
                patch.reshape(ho * wo, cin),
                w_taps[dy * k + dx],
                preferred_element_type=jnp.float32,
            )
            acc = m if acc is None else acc + m
    return acc.reshape(ho, wo, cout)


def _emit_cfg(b: _Builder, cfgs, in_ch, in_hw, path_prefix):
    """Recursively emit ``fn(y, P, Sin, Sout, taps) -> y`` for a config
    list, mirroring compile.compile_block's traversal and naming.

    P: list of param values; Sin: list of input state values;
    Sout: dict slot-index -> new state value; taps: Return collector.
    """
    if isinstance(cfgs, S.Residual):
        mode, branch_cfgs = "residual", list(cfgs)
    elif isinstance(cfgs, S.Dense):
        mode, branch_cfgs = "dense", list(cfgs)
    else:
        mode, branch_cfgs = "plain", [list(cfgs)]

    branch_fns = []
    out_ch, out_hw = 0, None
    for bi, branch_cfg in enumerate(branch_cfgs):
        layer_fns = []
        ch, hw = in_ch, in_hw
        for li, element in enumerate(branch_cfg):
            lpath = path_prefix + (f"b{bi}", f"l{li}")
            if isinstance(element, S.LayerSpec):
                fn, ch, hw = _emit_leaf(b, element, ch, hw, lpath)
            elif isinstance(element, (list, tuple)):
                fn, ch, hw = _emit_cfg(b, element, ch, hw, lpath)
            else:
                raise TypeError(f"Bad config element at {lpath}: {element!r}")
            layer_fns.append(fn)
        branch_fns.append(layer_fns)
        if mode == "residual":
            out_ch = ch
        elif mode == "dense":
            out_ch += ch
        else:
            out_ch = ch
        out_hw = hw

    def fn(y, P, Sin, Sout, taps):
        outs = []
        for layer_fns_b in branch_fns:
            yb = y
            for lf in layer_fns_b:
                yb = lf(yb, P, Sin, Sout, taps)
            outs.append(yb)
        if mode == "residual":
            yo = outs[0]
            for o in outs[1:]:
                yo = yo + o
            return yo
        if mode == "dense":
            return jnp.concatenate(outs, axis=-1)
        return outs[0]

    return fn, out_ch, out_hw


def _emit_leaf(b: _Builder, layer, in_ch, in_hw, lpath):
    h, w = in_hw
    cdt = b.compute_dtype
    sdt = b.state_dtype

    if isinstance(layer, (S.Pass, S.Return)):
        if isinstance(layer, S.Return):
            def fn(y, P, Sin, Sout, taps):
                taps.append(y)
                return y
        else:
            def fn(y, P, Sin, Sout, taps):
                return y
        return fn, in_ch, in_hw

    if isinstance(layer, S.Conv):
        out = in_ch if layer.out_channels is None else layer.out_channels
        k, s = layer.kernel_size, layer.stride
        if k not in (1, 3) or s not in (1, 2):
            raise UnsupportedLayer(f"Conv k={k} s={s} at {lpath}")
        pad = k // 2
        out_hw = tuple((d + 2 * pad - k) // s + 1 for d in in_hw)
        leaf = b._lookup(b.params_tree, lpath)
        if "w_q" in leaf:
            # int8-PTQ leaf (ops/quantize.py): the megakernel runs fp
            # tap matmuls, so rebuild the fp weights at build time
            w_arr = leaf["w_q"].astype(jnp.float32) * leaf["w_scale"]
        else:
            w_arr = leaf["w"]
        taps_arr = jnp.asarray(w_arr).astype(cdt).reshape(k * k, in_ch, out)
        pi = b.add_param(taps_arr)

        def fn(y, P, Sin, Sout, taps, k=k, s=s, pad=pad, out_hw=out_hw,
               out=out, pi=pi):
            y = _pad_hw(y, pad)
            return _conv_taps(y, P[pi], k, s, out_hw, out).astype(cdt)

        return fn, out, out_hw

    if isinstance(layer, S.Norm):
        p = b._lookup(b.params_tree, lpath)
        st = b._lookup(b.stats_tree, lpath)
        kvec, bvec = _bn_eval_coeffs(p, st, layer.eps)
        pi = b.add_param(jnp.asarray(kvec).astype(cdt))
        bi_ = b.add_param(jnp.asarray(bvec).astype(cdt))

        def fn(y, P, Sin, Sout, taps, pi=pi, bi_=bi_):
            # matches compile._bn_eval_affine: affine in activation dtype
            return y * P[pi] + P[bi_]

        return fn, in_ch, in_hw

    if isinstance(layer, (S.LIF, S.LI)):
        cell = "lif" if isinstance(layer, S.LIF) else "li"
        shape = (h, w, in_ch)
        vi = b.add_state(lpath, 0, shape, sdt)
        ii = b.add_state(lpath, 1, shape, sdt)

        def fn(y, P, Sin, Sout, taps, cell=cell, vi=vi, ii=ii):
            # single source of truth for the Euler math: ops/neurons
            # (forward-only; the surrogate-gradient custom_vjp primal
            # traces cleanly inside the kernel)
            v = Sin[vi].astype(jnp.float32)
            i = Sin[ii].astype(jnp.float32)
            x = y.astype(jnp.float32)
            if cell == "lif":
                out, new = neurons.lif_step(x, neurons.LIFState(v, i))
            else:
                out, new = neurons.li_step(x, neurons.LIState(v, i))
            Sout[vi] = new.v.astype(sdt)
            Sout[ii] = new.i.astype(sdt)
            return out.astype(cdt)

        return fn, in_ch, in_hw

    if isinstance(layer, (S.ReLU, S.SiLU, S.Tanh)):
        act = (
            jax.nn.relu if isinstance(layer, S.ReLU)
            else jax.nn.silu if isinstance(layer, S.SiLU)
            else jnp.tanh
        )

        def fn(y, P, Sin, Sout, taps, act=act):
            return act(y.astype(jnp.float32)).astype(y.dtype)

        return fn, in_ch, in_hw

    if isinstance(layer, S.Pool):
        k = layer.kernel_size
        s = layer.stride if layer.stride is not None else k
        if s != k or h % k or w % k:
            raise UnsupportedLayer(
                f"Pool k={k} s={s} on {in_hw} at {lpath}"
            )
        oh, ow = h // k, w // k
        ptype = layer.type

        def fn(y, P, Sin, Sout, taps, k=k, oh=oh, ow=ow, ptype=ptype):
            c = y.shape[-1]
            yr = y.reshape(oh, k, ow, k, c)
            if ptype == "M":
                return yr.max(axis=(1, 3))
            red = yr.astype(jnp.float32).sum(axis=(1, 3))
            if ptype == "A":
                red = red / (k * k)
            return red.astype(y.dtype)

        return fn, in_ch, (oh, ow)

    if isinstance(layer, S.Up):
        if layer.mode != "nearest":
            raise UnsupportedLayer(f"Up mode {layer.mode} at {lpath}")
        sc = layer.scale

        def fn(y, P, Sin, Sout, taps, sc=sc):
            y = jnp.repeat(y, sc, axis=0)
            return jnp.repeat(y, sc, axis=1)

        return fn, in_ch, (h * sc, w * sc)

    raise UnsupportedLayer(f"{type(layer).__name__} at {lpath}")


class StreamingMegakernel:
    """One-frame, batch-1 fused forward for a :class:`SODa` detector.

    ``step(x, state) -> ((cls_preds, bbox_preds), new_state)`` with the
    same shapes/state pytree as ``model.step`` at B=1 — a drop-in for
    the scan inside ``model.predict``.
    """

    def __init__(self, model, params, stats, use_pallas: bool = True,
                 interpret: Optional[bool] = None):
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.model = model
        self.interpret = interpret
        self.use_pallas = use_pallas
        b = _Builder(model, params, stats)

        backbone_fn, ch, hw = _emit_cfg(
            b, model.backbone_cfgs(), model.in_channels,
            tuple(model.in_hw), ("backbone",),
        )
        neck_fn, _, _ = _emit_cfg(b, model.neck_cfgs(), ch, hw, ("neck",))

        head_cfg = model.head_cfgs(model.num_box_out, model.num_class_out)
        head_fns = []
        for idx, (hch, hhw) in enumerate(model.neck_out_shape):
            base_fn, bch, bhw = _emit_cfg(
                b, head_cfg[0], hch, hhw, (f"head{idx}", "base")
            )
            box_fn, _, _ = _emit_cfg(
                b, head_cfg[1], bch, bhw, (f"head{idx}", "box")
            )
            cls_fn, _, _ = _emit_cfg(
                b, head_cfg[2], bch, bhw, (f"head{idx}", "cls")
            )
            head_fns.append((base_fn, box_fn, cls_fn))

        self._b = b
        self._fns = (backbone_fn, neck_fn, head_fns)
        self._n_heads = len(head_fns)

        def body(x, P, Sin):
            """x: [H, W, 2] frame -> ([(box_map, cls_map)] per scale,
            new state values)."""
            Sout: Dict[int, Any] = {}
            taps: List[Any] = []
            y = backbone_fn(x.astype(b.compute_dtype), P, Sin, Sout, taps)
            neck_fn(y, P, Sin, Sout, taps)
            if len(taps) != self._n_heads:
                # Mirror detector._trunk's explicit error: a spec whose
                # backbone emits a stray Return must not silently
                # truncate/misalign scales in the zip below.
                raise RuntimeError(
                    f"spec emitted {len(taps)} Return taps but the model "
                    f"defines {self._n_heads} heads"
                )
            outs = []
            for (base_fn, box_fn, cls_fn), fmap in zip(head_fns, taps):
                base = base_fn(fmap, P, Sin, Sout, taps)
                outs.append((
                    box_fn(base, P, Sin, Sout, taps),
                    cls_fn(base, P, Sin, Sout, taps),
                ))
            new_states = [
                Sout.get(i, Sin[i]) for i in range(len(b.state_slots))
            ]
            return outs, new_states

        self._body = body
        self._jit_step = jax.jit(self._step_impl)
        self._jit_predict = jax.jit(
            self._predict_impl, static_argnums=(2,)
        )

    # ---- state pytree <-> flat slots ----

    def _state_leaves(self, state):
        vals = []
        for slot in self._b.state_slots:
            node = state
            for p in slot.path:
                node = node[p]
            vals.append(node[slot.field].reshape(slot.shape))
        return vals

    def _rebuild_state(self, state, new_vals):
        state = jax.tree_util.tree_map(lambda x: x, state)  # shallow copy

        def set_path(tree, path, field, value):
            node = tree
            for p in path[:-1]:
                node = node[p]
            leaf = node[path[-1]]
            node[path[-1]] = type(leaf)(*(
                value[None] if f == field else leaf[f]
                for f in range(len(leaf))
            ))

        for slot, val in zip(self._b.state_slots, new_vals):
            set_path(state, slot.path, slot.field, val)
        return state

    # ---- execution ----

    def _run_xla(self, x, state_vals):
        return self._body(x, self._b.param_vals, state_vals)

    def _run_pallas(self, x, state_vals):
        b = self._b
        # Cast the frame outside the kernel: Mosaic has no uint8 ->
        # bfloat16 cast, and callers feed raw uint8 event frames.
        x = x.astype(b.compute_dtype)
        n_p, n_s = len(b.param_vals), len(b.state_slots)
        out_maps_shapes = []
        # trace shapes once via eval_shape on the XLA body
        outs_shape = jax.eval_shape(
            lambda x, sv: self._body(x, b.param_vals, sv)[0], x, state_vals
        )
        for box_s, cls_s in outs_shape:
            out_maps_shapes.append(jax.ShapeDtypeStruct(box_s.shape,
                                                        box_s.dtype))
            out_maps_shapes.append(jax.ShapeDtypeStruct(cls_s.shape,
                                                        cls_s.dtype))
        state_shapes = [
            jax.ShapeDtypeStruct(s.shape, s.dtype) for s in b.state_slots
        ]

        def kernel(*refs):
            x_ref = refs[0]
            p_refs = refs[1:1 + n_p]
            s_refs = refs[1 + n_p:1 + n_p + n_s]
            out_refs = refs[1 + n_p + n_s:1 + n_p + n_s
                            + 2 * self._n_heads]
            so_refs = refs[1 + n_p + n_s + 2 * self._n_heads:]
            P = [r[:] for r in p_refs]
            Sin = [r[:] for r in s_refs]
            outs, new_states = self._body(x_ref[:], P, Sin)
            for i, (box, cls) in enumerate(outs):
                out_refs[2 * i][:] = box
                out_refs[2 * i + 1][:] = cls
            for r, v in zip(so_refs, new_states):
                r[:] = v

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        n_out = len(out_maps_shapes) + len(state_shapes)
        flat = pl.pallas_call(
            kernel,
            in_specs=[vspec] * (1 + n_p + n_s),
            out_specs=[vspec] * n_out,
            out_shape=out_maps_shapes + state_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(x, *b.param_vals, *state_vals)
        outs = [
            (flat[2 * i], flat[2 * i + 1]) for i in range(self._n_heads)
        ]
        return outs, list(flat[2 * self._n_heads:])

    def _step_impl(self, x, state_vals):
        run = self._run_pallas if self.use_pallas else self._run_xla
        outs, new_states = run(x, state_vals)
        box_list, cls_list = [], []
        for box_map, cls_map in outs:
            box_list.append(box_map.reshape(1, -1, 4))
            cls_list.append(
                cls_map.reshape(1, -1, self.model.num_classes + 1)
            )
        cls_preds = jnp.concatenate(cls_list, axis=1)
        bbox_preds = jnp.concatenate(box_list, axis=1)
        return (cls_preds, bbox_preds), new_states

    def _predict_impl(self, x, state_vals, max_out):
        preds, new_states = self._step_impl(x, state_vals)
        dets = self.model.detect(preds, max_out=max_out)
        boxes = jnp.clip(dets[..., 2:], 0.0, 1.0)
        dets = jnp.concatenate([dets[..., :2], boxes], axis=-1)
        return dets, new_states

    def _flat_state(self, state):
        """None / model pytree / already-flat list -> flat slot list."""
        if state is None:
            state = self.model.init_state(1)
        if isinstance(state, list):
            return state
        return self._state_leaves(state)

    def step(self, x, state=None):
        """One frame [H, W, 2] (or [1, H, W, 2]) -> ((cls [1, A, C+1],
        box [1, A, 4]), new state pytree — the ``model.step``
        contract)."""
        if x.ndim == 4:
            if x.shape[0] != 1:
                raise ValueError(
                    f"megakernel is batch-1 only, got batch {x.shape[0]}"
                )
            x = x[0]
        was_tree = state is not None and not isinstance(state, list)
        tree = state if was_tree else self.model.init_state(1)
        preds, new_vals = self._jit_step(x, self._flat_state(state))
        return preds, self._rebuild_state(tree, new_vals)

    def predict(self, x, state=None, max_out: int = 300):
        """Full streaming predict: one jitted dispatch per frame (step
        + detection decode). The carried state is an OPAQUE flat list —
        pass it straight back in; convert with :meth:`to_model_state`
        for checkpoint/interop."""
        squeeze = x.ndim == 3
        if not squeeze:
            if x.shape[0] != 1:
                raise ValueError(
                    f"megakernel is batch-1 only, got batch {x.shape[0]}"
                )
            x = x[0]
        dets, new_vals = self._jit_predict(
            x, self._flat_state(state), max_out
        )
        if squeeze:
            dets = dets[0]
        return dets, new_vals

    def to_model_state(self, state_vals):
        """Flat slot list (from :meth:`predict`) -> model state pytree."""
        return self._rebuild_state(self.model.init_state(1), state_vals)
