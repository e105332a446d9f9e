"""Property-based tests (hypothesis) for the pure detection math."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from snn_for_object_detection_tpu.ops import boxes

valid_box = st.tuples(
    st.floats(0.0, 0.7), st.floats(0.0, 0.7),
    st.floats(0.05, 0.3), st.floats(0.05, 0.3),
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))


@settings(max_examples=30, deadline=None)
@given(st.lists(valid_box, min_size=1, max_size=8))
def test_corner_center_roundtrip_property(bs):
    b = np.asarray(bs, np.float32)
    back = np.asarray(
        boxes.center_to_corner(boxes.corner_to_center(jnp.asarray(b)))
    )
    np.testing.assert_allclose(back, b, rtol=1e-4, atol=1e-5)


@settings(max_examples=30, deadline=None)
@given(st.lists(valid_box, min_size=1, max_size=6),
       st.lists(valid_box, min_size=1, max_size=6))
def test_iou_bounds_and_symmetry(b1, b2):
    a = np.asarray(b1, np.float32)
    b = np.asarray(b2, np.float32)
    iou_ab = np.asarray(boxes.box_iou(jnp.asarray(a), jnp.asarray(b)))
    iou_ba = np.asarray(boxes.box_iou(jnp.asarray(b), jnp.asarray(a)))
    assert (iou_ab >= -1e-6).all() and (iou_ab <= 1 + 1e-6).all()
    np.testing.assert_allclose(iou_ab, iou_ba.T, rtol=1e-5, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.lists(valid_box, min_size=2, max_size=8))
def test_offset_codec_roundtrip_property(bs):
    """decode(anchors, encode(anchors, gt)) == gt for any valid pair."""
    b = np.asarray(bs, np.float32)
    anchors = jnp.asarray(b)
    gt = jnp.asarray(np.roll(b, 1, axis=0))  # pair each with another box
    back = np.asarray(
        boxes.decode_offsets(anchors, boxes.encode_offsets(anchors, gt))
    )
    np.testing.assert_allclose(back, np.asarray(gt), rtol=1e-3, atol=2e-3)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(1, 3),
       st.integers(1, 2))
def test_channel_inference_property(c1, c2, n_branches, k):
    """Dense concat channels always sum; Residual requires equality."""
    from snn_for_object_detection_tpu.models import compile as C
    from snn_for_object_detection_tpu.models import spec as S

    dense = S.Dense([[S.Conv(c1 * 4, k)] for _ in range(n_branches)])
    blk = C.compile_block(dense, c2, (8, 8))
    assert blk.out_channels == c1 * 4 * n_branches

    res = S.Residual([[S.Conv(c1 * 4, k)] for _ in range(n_branches)])
    blk2 = C.compile_block(res, c2, (8, 8))
    assert blk2.out_channels == c1 * 4
