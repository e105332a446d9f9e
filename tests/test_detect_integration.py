"""End-to-end detect-path check: ideal head outputs -> mAP ~ 1.

Constructs class logits and box offsets that a perfectly-trained head
would produce for the matched anchors (via the same RoI encoding used
by the loss), runs the full softmax+NMS+mAP pipeline, and requires
near-perfect scores. This separates "the detector can't learn" from
"the detect path is broken" when training curves look flat.
"""

import jax
import jax.numpy as jnp
import numpy as np

from snn_for_object_detection_tpu.ops import matching, nms
from snn_for_object_detection_tpu.train.metrics import (
    MeanAveragePrecision,
    detections_to_map_inputs,
)
from snn_for_object_detection_tpu.ops import anchors as anchor_ops


def test_perfect_head_outputs_give_full_map(rng):
    sizes = anchor_ops.default_scale_sizes(2)
    A = np.concatenate([
        anchor_ops.generate_anchors(8, 10, sizes[0], anchor_ops.DEFAULT_RATIOS),
        anchor_ops.generate_anchors(4, 5, sizes[1], anchor_ops.DEFAULT_RATIOS),
    ])
    anchors = jnp.asarray(A)

    labels = np.full((2, 4, 5), -1.0, np.float32)
    labels[0, 0] = [0, 0.22, 0.20, 0.55, 0.60]
    labels[0, 1] = [1, 0.60, 0.15, 0.95, 0.45]
    labels[1, 0] = [1, 0.10, 0.55, 0.45, 0.95]
    labels_j = jnp.asarray(labels)

    offsets, mask, cls = matching.match_targets(anchors, labels_j, 0.4)

    # Ideal head: +8 logit on the assigned class (incl. background)
    num_classes = 2
    onehot = jax.nn.one_hot(cls, num_classes + 1) * 8.0
    probs = jax.nn.softmax(onehot, axis=-1)

    dets = nms.multibox_detection(probs, offsets, anchors, max_out=100)
    preds, targets = detections_to_map_inputs(np.asarray(dets), labels)
    m = MeanAveragePrecision()
    m.update(preds, targets)
    r = m.compute()
    # offsets encode the GT exactly -> decoded boxes == GT, IoU 1
    assert r["map_50"] > 0.99, r
    assert r["map"] > 0.99, r
    assert r["mar_10"] > 0.99, r


def test_weak_foreground_still_detected(rng):
    """Foreground logits only slightly above background at matched
    anchors: detections must still appear (argmax decides the class)."""
    A = anchor_ops.generate_anchors(
        8, 10, np.array([0.2, 0.4, 0.6], np.float32), anchor_ops.DEFAULT_RATIOS
    )
    anchors = jnp.asarray(A)
    labels = np.full((1, 2, 5), -1.0, np.float32)
    labels[0, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    offsets, mask, cls = matching.match_targets(
        anchors, jnp.asarray(labels), 0.4
    )
    logits = jax.nn.one_hot(cls, 3) * 0.5  # tiny margin
    probs = jax.nn.softmax(logits, axis=-1)
    dets = nms.multibox_detection(probs, offsets, anchors, max_out=50)
    d = np.asarray(dets[0])
    kept = d[d[:, 0] >= 0]
    assert len(kept) >= 1
    assert (kept[:, 0] == 0).any()
