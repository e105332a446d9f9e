"""RoI anchor assignment vs. a loopy numpy oracle of utils/roi.py."""

import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import matching
from tests.test_boxes import np_iou, random_boxes


def oracle_assign(anchors, gt, thr):
    """Loopy re-derivation of RoI._assign_anchor_to_box (roi.py:65-109)."""
    num_anchors, num_gt = len(anchors), len(gt)
    jac = np_iou(anchors, gt)
    amap = np.full(num_anchors, -1, np.int64)
    max_ious = jac.max(axis=1)
    idx = jac.argmax(axis=1)
    mask = max_ious >= thr
    amap[mask] = idx[mask]
    jac = jac.copy()
    for _ in range(num_gt):
        flat = jac.argmax()
        box_idx = flat % num_gt
        anc_idx = flat // num_gt
        amap[anc_idx] = box_idx
        jac[:, box_idx] = -1
        jac[anc_idx, :] = -1
    return amap


def oracle_targets(anchors, labels, thr):
    """Loopy re-derivation of RoI.__call__ (roi.py:18-63), one item."""
    amap = oracle_assign(anchors, labels[:, 1:], thr)
    mask = (amap >= 0).astype(np.float32)[:, None].repeat(4, 1)
    cls = np.zeros(len(anchors), np.int64)
    assigned = np.zeros((len(anchors), 4), np.float32)
    pos = np.nonzero(amap >= 0)[0]
    cls[pos] = labels[amap[pos], 0].astype(np.int64) + 1
    assigned[pos] = labels[amap[pos], 1:]
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
            (assigned[:, 0] + assigned[:, 2]) / 2,
            (assigned[:, 1] + assigned[:, 3]) / 2,
            assigned[:, 2] - assigned[:, 0],
            assigned[:, 3] - assigned[:, 1],
        ],
        axis=1,
    )
    off = np.concatenate(
        [
            10 * (gc[:, :2] - ac[:, :2]) / ac[:, 2:],
            5 * np.log(1e-6 + gc[:, 2:] / ac[:, 2:]),
        ],
        axis=1,
    )
    return off * mask, mask, cls


def test_assignment_vs_oracle(rng):
    anchors = random_boxes(rng, 50)
    gt = random_boxes(rng, 4)
    labels = np.concatenate(
        [rng.integers(0, 2, (4, 1)).astype(np.float32), gt], axis=1
    )
    got = matching.assign_anchors_to_boxes(
        jnp.asarray(anchors), jnp.asarray(labels), 0.4
    )
    exp = oracle_assign(anchors, gt, 0.4)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_match_targets_vs_oracle(rng):
    anchors = random_boxes(rng, 40)
    batch = []
    for _ in range(3):
        gt = random_boxes(rng, 3)
        labels = np.concatenate(
            [rng.integers(0, 2, (3, 1)).astype(np.float32), gt], axis=1
        )
        batch.append(labels)
    labels = np.stack(batch)
    off, mask, cls = matching.match_targets(
        jnp.asarray(anchors), jnp.asarray(labels), 0.4
    )
    for b in range(3):
        off_e, mask_e, cls_e = oracle_targets(anchors, labels[b], 0.4)
        np.testing.assert_allclose(np.asarray(off[b]), off_e, rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(mask[b]), mask_e)
        np.testing.assert_array_equal(np.asarray(cls[b]), cls_e)


def test_match_targets_with_padding(rng):
    """-1-padded label rows must be ignored (collate pads with -1,
    datasets.py:130-134)."""
    anchors = random_boxes(rng, 30)
    gt = random_boxes(rng, 2)
    real = np.concatenate([np.array([[0.0], [1.0]]), gt], axis=1).astype(np.float32)
    padded = np.concatenate(
        [real, np.full((3, 5), -1.0, np.float32)], axis=0
    )[None]
    off_p, mask_p, cls_p = matching.match_targets(
        jnp.asarray(anchors), jnp.asarray(padded), 0.4
    )
    off_r, mask_r, cls_r = matching.match_targets(
        jnp.asarray(anchors), jnp.asarray(real[None]), 0.4
    )
    np.testing.assert_allclose(np.asarray(off_p), np.asarray(off_r), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_r))
    np.testing.assert_array_equal(np.asarray(cls_p), np.asarray(cls_r))


def test_every_gt_gets_an_anchor(rng):
    """Stage 2 must force-assign each GT to its argmax anchor even below
    the IoU threshold (roi.py:100-108)."""
    anchors = random_boxes(rng, 64)
    gt = random_boxes(rng, 5)
    labels = np.concatenate(
        [np.zeros((5, 1), np.float32), gt], axis=1
    )
    amap = np.asarray(
        matching.assign_anchors_to_boxes(
            jnp.asarray(anchors), jnp.asarray(labels), 0.99
        )
    )
    # With an impossible threshold, stage 1 assigns nothing, but stage 2
    # must still place all 5 GT boxes.
    assigned = set(amap[amap >= 0].tolist())
    assert assigned == {0, 1, 2, 3, 4}


def test_no_valid_gt():
    anchors = np.array([[0.1, 0.1, 0.3, 0.3]], np.float32)
    labels = np.full((1, 4, 5), -1.0, np.float32)
    off, mask, cls = matching.match_targets(
        jnp.asarray(anchors), jnp.asarray(labels), 0.4
    )
    assert np.all(np.asarray(cls) == 0)
    assert np.all(np.asarray(mask) == 0)
    assert np.all(np.asarray(off) == 0)
