"""NMS / multibox_detection vs. loopy oracles of utils/box.py:82-153."""

import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import boxes as box_ops
from snn_for_object_detection_tpu.ops import nms as nms_ops
from tests.test_boxes import np_iou, random_boxes


def oracle_nms_keep(boxes, scores, class_id, num_real_classes, iou_threshold):
    """Loopy re-derivation of nms() (box.py:82-99): per-class greedy."""
    keep = []
    for class_idx in range(num_real_classes):
        cls_idx = np.nonzero(class_id == class_idx)[0]
        boxes_cls = boxes[cls_idx]
        order = np.argsort(-scores[cls_idx], kind="stable")
        B = list(order)
        while B:
            i = B[0]
            keep.append(cls_idx[i])
            if len(B) == 1:
                break
            iou = np_iou(boxes_cls[i : i + 1], boxes_cls[B[1:]])[0]
            B = [B[k + 1] for k in np.nonzero(iou <= iou_threshold)[0]]
    return set(int(k) for k in keep)


def make_preds(rng, num_anchors, num_classes):
    anchors = random_boxes(rng, num_anchors)
    offsets = rng.normal(0, 0.5, (num_anchors, 4)).astype(np.float32)
    logits = rng.normal(0, 2, (num_anchors, num_classes + 1)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return anchors, offsets, probs


def test_multibox_vs_oracle(rng):
    A, C = 60, 2
    anchors, offsets, probs = make_preds(rng, A, C)

    got = np.asarray(
        nms_ops.multibox_detection(
            jnp.asarray(probs[None]),
            jnp.asarray(offsets[None]),
            jnp.asarray(anchors),
            max_out=A,
        )
    )[0]

    # Oracle follows box.py:126-153
    conf = probs.max(1)
    cid = probs.argmax(1) - 1
    decoded = np.asarray(
        box_ops.decode_offsets(jnp.asarray(anchors), jnp.asarray(offsets))
    )
    keep = oracle_nms_keep(decoded, conf, cid, C, 0.1)

    exp_cid = np.array(
        [cid[a] if a in keep else -1 for a in range(A)], np.float32
    )
    below = conf < 0.009999999
    exp_conf = np.where(below, 1 - conf, conf)
    exp_cid = np.where(below, -1, exp_cid)

    # got rows are conf-sorted over all anchors; match rows by box.
    for row in got:
        g_cid, g_conf = row[0], row[1]
        g_box = row[2:]
        dists = np.abs(decoded - g_box[None]).sum(1)
        a = int(dists.argmin())
        assert dists[a] < 1e-4
        assert g_cid == exp_cid[a], f"anchor {a}: {g_cid} != {exp_cid[a]}"
        np.testing.assert_allclose(g_conf, exp_conf[a], rtol=1e-5)


def test_multibox_shapes(rng):
    A, C, B, K = 100, 2, 3, 32
    anchors, _, _ = make_preds(rng, A, C)
    offsets = rng.normal(0, 0.5, (B, A, 4)).astype(np.float32)
    logits = rng.normal(0, 2, (B, A, C + 1)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = nms_ops.multibox_detection(
        jnp.asarray(probs), jnp.asarray(offsets), jnp.asarray(anchors), max_out=K
    )
    assert out.shape == (B, K, 6)


def test_nms_suppresses_overlaps():
    # Two near-identical boxes of the same class: only the higher-conf
    # one survives; a third distinct box survives.
    boxes = np.array(
        [
            [0.1, 0.1, 0.3, 0.3],
            [0.11, 0.11, 0.31, 0.31],
            [0.6, 0.6, 0.8, 0.8],
        ],
        np.float32,
    )
    cid = np.array([0, 0, 0], np.int32)
    keep = np.asarray(
        nms_ops._greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(cid), 0.1)
    )
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_classes_independent():
    # Same overlap but different classes: both survive (box.py:85 loops
    # per class).
    boxes = np.array(
        [[0.1, 0.1, 0.3, 0.3], [0.11, 0.11, 0.31, 0.31]], np.float32
    )
    cid = np.array([0, 1], np.int32)
    keep = np.asarray(
        nms_ops._greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(cid), 0.1)
    )
    np.testing.assert_array_equal(keep, [True, True])


def test_background_never_kept():
    boxes = np.array([[0.1, 0.1, 0.3, 0.3]], np.float32)
    cid = np.array([-1], np.int32)
    keep = np.asarray(
        nms_ops._greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(cid), 0.1)
    )
    np.testing.assert_array_equal(keep, [False])
