"""Anchor-to-ground-truth assignment (RoI labeling), fully vectorized.

Parity target: ``RoI`` in /root/reference/utils/roi.py:18-109 (the
d2l-style two-stage assignment):

1. every anchor takes the valid GT with max IoU if it is >= threshold
   (roi.py:89-97);
2. every GT force-claims its argmax anchor via an iterative global
   argmax with row/column discard (roi.py:100-108).

The reference runs stage 2 as a Python loop over GT boxes per batch
item. Here labels arrive ``-1``-padded to a static ``[B, N, 5]`` (as
produced by the reference collate, datasets.py:127-135), stage 2 is a
``lax.fori_loop`` over the padded N with masked updates, and the batch
dimension is ``vmap``-ed — the whole assignment is one XLA program with
no host synchronization.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from snn_for_object_detection_tpu.ops import boxes as box_ops

Array = jax.Array


def assign_anchors_to_boxes(
    anchors: Array, labels: Array, iou_threshold: float
) -> Array:
    """Assign GT box indices to anchors for one batch item.

    :param anchors: [A, 4] corner-format anchors.
    :param labels: [N, 5] (class, x1, y1, x2, y2), rows padded with -1.
    :param iou_threshold: Minimum IoU for stage-1 assignment.
    :return: [A] int32 map anchor -> gt index, -1 for background.
    """
    num_gt = labels.shape[0]
    valid = labels[:, 0] >= 0
    gt = labels[:, 1:]
    iou = box_ops.box_iou(anchors, gt)  # [A, N]
    # Invalid (padded) GT columns can never win: mark with -1 (< any IoU).
    iou = jnp.where(valid[None, :], iou, -1.0)

    # Stage 1: per-anchor argmax over GT, thresholded.
    max_iou = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1).astype(jnp.int32)
    amap = jnp.where(max_iou >= iou_threshold, arg, -1)

    # Stage 2: iterative global argmax with row/col discard. Discarded
    # and padded entries are -1, so `val >= 0` gates the masked update;
    # the loop runs the static padded N times (no-ops once exhausted).
    def body(_, carry):
        amap, jac = carry
        flat = jnp.argmax(jac)
        anc_idx = (flat // num_gt).astype(jnp.int32)
        box_idx = (flat % num_gt).astype(jnp.int32)
        val = jac[anc_idx, box_idx]
        do = val >= 0.0
        amap = jnp.where(do, amap.at[anc_idx].set(box_idx), amap)
        jac = jnp.where(
            do, jac.at[:, box_idx].set(-1.0).at[anc_idx, :].set(-1.0), jac
        )
        return amap, jac

    amap, _ = jax.lax.fori_loop(0, num_gt, body, (amap, iou))
    return amap


@partial(jax.jit, static_argnames=("iou_threshold",))
def match_targets(
    anchors: Array, labels: Array, iou_threshold: float = 0.5
) -> Tuple[Array, Array, Array]:
    """Label anchors with offsets / masks / classes for a whole batch.

    Mirrors ``RoI.__call__`` (roi.py:18-63) with the per-item Python
    loop replaced by ``vmap``.

    :param anchors: [A, 4] corner-format anchors.
    :param labels: [B, N, 5] (class, x1, y1, x2, y2), -1-padded.
    :return: ``(bbox_offset [B, A, 4], bbox_mask [B, A, 4],
        class_labels [B, A])`` with class 0 = background.
    """

    def one(label):
        amap = assign_anchors_to_boxes(anchors, label, iou_threshold)
        pos = amap >= 0
        idx = jnp.maximum(amap, 0)
        assigned = jnp.where(pos[:, None], label[idx, 1:], 0.0)
        class_labels = jnp.where(
            pos, label[idx, 0].astype(jnp.int32) + 1, 0
        )
        mask = jnp.repeat(pos[:, None].astype(anchors.dtype), 4, axis=1)
        offset = box_ops.encode_offsets(anchors, assigned) * mask
        return offset, mask, class_labels

    return jax.vmap(one)(labels)
