"""Whole-network B=1 streaming megakernel vs the per-layer step path.

The megakernel (ops/megakernel.py) re-walks the spec tree into one
fused body; these tests pin it against ``model.step``/``model.predict``
— same weights, same frames, same carried state — in both execution
modes (Pallas interpret and the XLA fallback body).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models.detector import SODa
from snn_for_object_detection_tpu.models.spec import (
    LIF, LI, LSTM, Conv, Dense, Norm, Pool, Residual, Return, Tanh, Up,
)
from snn_for_object_detection_tpu.ops.megakernel import (
    StreamingMegakernel,
    UnsupportedLayer,
)
from tests.test_detector import MicroSODa


class StructYolo(SODa):
    """Exercises Residual/Dense nesting, stride-2 downsamples, 1x1
    projections, Pool and Up — the full supported layer menu."""

    def backbone_cfgs(self):
        return [
            Conv(8, 3, 2), Norm(), LIF(),
            Dense([
                [Conv(4, 1), Norm(), LIF(),
                 Residual([[Conv(4, 3), Norm(), LIF()], []])],
                [Conv(4, 1)],
            ]),
            Pool("S"),
        ]

    def neck_cfgs(self):
        return [
            Conv(8, 3, 2), Norm(), LIF(), Return(),
            Conv(8, 3, 2), Norm(), LIF(), Up(2), Pool("M"), Return(),
        ]

    def head_cfgs(self, box_out, cls_out):
        return [
            [Conv(kernel_size=1), Norm(), LI(), Tanh()],
            [Conv(box_out, 1)],
            [Conv(cls_out, 1)],
        ]


def _roll(model, params, stats, frames):
    """Reference trajectory through model.step (B=1)."""
    state = model.init_state(1)
    preds = []
    for x in frames:
        (c, b), _, state, _ = model.step(
            params, stats, state, x[None], train=False
        )
        preds.append((np.asarray(c), np.asarray(b)))
    return preds, state


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("cls", [MicroSODa, StructYolo])
def test_megakernel_matches_step(cls, use_pallas, rng):
    model = cls(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))
    frames = [
        jnp.asarray(rng.random((32, 40, 2)) < 0.25, jnp.float32)
        for _ in range(4)
    ]
    ref_preds, ref_state = _roll(model, params, stats, frames)

    mk = StreamingMegakernel(model, params, stats, use_pallas=use_pallas)
    state = None
    for t, x in enumerate(frames):
        (c, b), state = mk.step(x, state)
        np.testing.assert_allclose(
            np.asarray(c), ref_preds[t][0], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b), ref_preds[t][1], rtol=1e-4, atol=1e-5
        )
    # final carried state matches the step path's pytree
    ref_leaves = jax.tree_util.tree_leaves(ref_state)
    mk_leaves = jax.tree_util.tree_leaves(state)
    assert len(ref_leaves) == len(mk_leaves)
    for a, b_ in zip(ref_leaves, mk_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_megakernel_predict_matches_model_predict(rng):
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(1))
    frames = [
        jnp.asarray(rng.random((32, 40, 2)) < 0.25, jnp.float32)
        for _ in range(3)
    ]
    state_a = None
    state_b = None
    mk = StreamingMegakernel(model, params, stats, use_pallas=False)
    for x in frames:
        dets_a, state_a = model.predict(params, stats, x, state_a)
        dets_b, state_b = mk.predict(x, state_b)
        np.testing.assert_allclose(
            np.asarray(dets_a), np.asarray(dets_b), rtol=1e-4, atol=1e-5
        )


def test_megakernel_uint8_frames(rng):
    """Raw uint8 event frames (the production streaming input) must
    work on the Pallas path: the cast to compute dtype has to happen
    outside the kernel (Mosaic has no uint8 -> bf16 cast)."""
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0,
                      compute_dtype=jnp.bfloat16)
    params, stats = model.init(jax.random.PRNGKey(0))
    x8 = jnp.asarray(rng.random((32, 40, 2)) < 0.25, jnp.uint8)
    mk = StreamingMegakernel(model, params, stats, use_pallas=True)
    (c, b), st = mk.step(x8)
    (c_ref, b_ref), st_ref = mk.step(x8.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-5)


def test_megakernel_bf16_states(rng):
    """state_dtype=bf16 round-trips through the slot packing."""
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0,
                      state_dtype=jnp.bfloat16)
    params, stats = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((32, 40, 2)) < 0.25, jnp.float32)
    (c_ref, b_ref), _, st_ref, _ = model.step(
        params, stats, model.init_state(1), x[None], train=False
    )
    mk = StreamingMegakernel(model, params, stats, use_pallas=False)
    (c, b), st = mk.step(x)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=2e-2, atol=1e-3)
    for a, b_ in zip(jax.tree_util.tree_leaves(st_ref),
                     jax.tree_util.tree_leaves(st)):
        assert a.dtype == b_.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=2e-2, atol=1e-3,
        )


def test_unsupported_layer_raises():
    class LstmNet(MicroSODa):
        def backbone_cfgs(self):
            return [Conv(8, 3, 2), Norm(), LSTM()]

    model = LstmNet(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))
    with pytest.raises(UnsupportedLayer):
        StreamingMegakernel(model, params, stats)
