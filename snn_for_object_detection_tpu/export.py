"""StableHLO export of the streaming predict step (deployment).

`jax.export` serializes the jitted one-frame predict program —
weights, folded stats and the detection decode baked in as constants —
to a single portable blob. A serving process deserializes it and runs
frames through PJRT with NO model code, config or checkpoint loading:

    export_predict(model, params, stats, "predict.stablehlo")
    ...
    runner = load_predict("predict.stablehlo")   # any process, any host
    dets = runner(frame)                         # [1, K, 6]; carries state

The recurrent neuron state is threaded as flat arguments (the calling
convention survives serialization; `load_predict` zero-initializes it
and carries it across calls). The reference ships a Lightning
checkpoint that requires its full code tree to load
(/root/reference/models/soda.py + nets/tiny_yolo config); this is the
TPU-native deployment analogue with the code dependency compiled away.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_predict(model, params, stats, path: str,
                   batch_size: int | str = "b",
                   platforms=("cpu", "tpu")) -> None:
    """Serialize ``model.predict`` (one frame + carried state) with
    the given weights baked in. Lowered for every platform in
    ``platforms`` so one blob serves CPU smoke tests and TPU
    production alike. ``batch_size`` may be an int (fixed-shape
    program) or a dimension name like ``"b"`` (symbolic batch: ONE
    blob serves any camera count — the multi-stream serving shapes
    without re-export). Returns nothing; writes ``path``."""
    state0 = model.init_state(1)
    leaves, treedef = jax.tree_util.tree_flatten(state0)
    if isinstance(batch_size, str):
        (bdim,) = jax_export.symbolic_shape(batch_size)
    else:
        bdim = batch_size

    def fn(x, *state_leaves):
        st = jax.tree_util.tree_unflatten(treedef, state_leaves)
        dets, new_st = model.predict(params, stats, x, st)
        return (dets, *jax.tree_util.tree_leaves(new_st))

    h, w = model.in_hw
    args = (
        jax.ShapeDtypeStruct((bdim, h, w, model.in_channels),
                             jnp.uint8),
        *(jax.ShapeDtypeStruct((bdim,) + l.shape[1:], l.dtype)
          for l in leaves),
    )
    exp = jax_export.export(jax.jit(fn), platforms=list(platforms))(*args)
    with open(path, "wb") as f:
        f.write(exp.serialize())


class _Runner:
    """Deserialized predict program + carried recurrent state."""

    def __init__(self, exp):
        self._exp = exp
        self._state_avals = exp.in_avals[1:]
        self.state = None

    def reset(self) -> None:
        """Zero the recurrent state (stream gap / new camera)."""
        self.state = None

    @staticmethod
    def _shape(aval, b):
        # symbolic batch dims are non-int objects; concretize with the
        # incoming frame's batch
        return tuple(d if isinstance(d, int) else b for d in aval.shape)

    def __call__(self, frame: Any):
        """frame [B, H, W, C] uint8 -> detections [B, K, 6]
        (class, conf, x1, y1, x2, y2; class −1 = padding).

        The batch axis is the set of live streams; changing B would
        invalidate every stream's carried state, so a mid-stream B
        change raises — call :meth:`reset` first (or manage slot
        re-packing externally, e.g. via ``serve.StreamingEngine``)."""
        frame = jnp.asarray(frame, jnp.uint8)
        if self.state is None:
            self.state = [
                jnp.zeros(self._shape(a, frame.shape[0]), a.dtype)
                for a in self._state_avals
            ]
        elif self.state[0].shape[0] != frame.shape[0]:
            raise ValueError(
                f"batch changed {self.state[0].shape[0]} -> "
                f"{frame.shape[0]} mid-stream; this would silently "
                "zero every stream's recurrent state — call reset() "
                "to start over, or keep the batch constant"
            )
        out = self._exp.call(frame, *self.state)
        self.state = list(out[1:])
        return out[0]


def load_predict(path: str) -> _Runner:
    """Load a blob written by :func:`export_predict`; no model code,
    config or checkpoint needed."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return _Runner(exp)
