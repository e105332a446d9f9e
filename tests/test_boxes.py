"""Box op tests vs. independent numpy oracles (semantics of utils/box.py)."""

import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import boxes


def np_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    out = np.zeros((len(b1), len(b2)), np.float64)
    for i in range(len(b1)):
        for j in range(len(b2)):
            iw = min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0])
            ih = min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1])
            inter = max(iw, 0) * max(ih, 0)
            out[i, j] = inter / (a1[i] + a2[j] - inter)
    return out


def random_boxes(rng, n):
    xy = rng.uniform(0, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_corner_center_roundtrip(rng):
    b = random_boxes(rng, 16)
    c = boxes.corner_to_center(jnp.asarray(b))
    back = boxes.center_to_corner(c)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-6)
    # Spot-check the math
    np.testing.assert_allclose(
        np.asarray(c[:, 0]), (b[:, 0] + b[:, 2]) / 2, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(c[:, 2]), b[:, 2] - b[:, 0], rtol=1e-5)


def test_iou_vs_oracle(rng):
    b1 = random_boxes(rng, 20)
    b2 = random_boxes(rng, 7)
    got = boxes.box_iou(jnp.asarray(b1), jnp.asarray(b2))
    np.testing.assert_allclose(np.asarray(got), np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_iou_identity(rng):
    b = random_boxes(rng, 5)
    got = np.asarray(boxes.box_iou(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(got), np.ones(5), rtol=1e-5)


def test_offset_roundtrip(rng):
    anchors = random_boxes(rng, 32)
    gt = random_boxes(rng, 32)
    off = boxes.encode_offsets(jnp.asarray(anchors), jnp.asarray(gt))
    back = boxes.decode_offsets(jnp.asarray(anchors), off)
    # eps=1e-6 in the wh log makes the roundtrip approximate
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-3, atol=1e-4)


def test_offset_encode_oracle(rng):
    anchors = random_boxes(rng, 8)
    gt = random_boxes(rng, 8)
    got = np.asarray(boxes.encode_offsets(jnp.asarray(anchors), jnp.asarray(gt)))
    # utils/box.py:62-69
    ac = np.stack(
        [
            (anchors[:, 0] + anchors[:, 2]) / 2,
            (anchors[:, 1] + anchors[:, 3]) / 2,
            anchors[:, 2] - anchors[:, 0],
            anchors[:, 3] - anchors[:, 1],
        ],
        axis=1,
    )
    gc = np.stack(
        [
            (gt[:, 0] + gt[:, 2]) / 2,
            (gt[:, 1] + gt[:, 3]) / 2,
            gt[:, 2] - gt[:, 0],
            gt[:, 3] - gt[:, 1],
        ],
        axis=1,
    )
    exp_xy = 10 * (gc[:, :2] - ac[:, :2]) / ac[:, 2:]
    exp_wh = 5 * np.log(1e-6 + gc[:, 2:] / ac[:, 2:])
    # fp32 op vs float64 oracle: differences amplified by the x10 scale
    np.testing.assert_allclose(got[:, :2], exp_xy, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got[:, 2:], exp_wh, rtol=1e-3, atol=1e-3)
