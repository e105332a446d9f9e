"""Shape-static batched NMS and detection post-processing.

Parity target: ``nms`` / ``multibox_detection`` in
/root/reference/utils/box.py:82-153 — per-class greedy NMS by
confidence, background = class -1, low-confidence predictions demoted to
background with inverted confidence.

The reference implements NMS as a data-dependent Python ``while`` loop
per class per batch item (box.py:89-98). That cannot live inside an XLA
program, so the TPU design is:

1. select the top-K anchors by confidence (``lax.top_k``; K is static,
   default 300 — far above the COCO maxDet=100 horizon that consumes
   these detections, soda.py:294-321);
2. one [K, K] IoU matrix plus a ``fori_loop`` of masked row-suppression
   steps (greedy NMS in sorted order, suppression restricted to equal
   class ids — the per-class semantics of box.py:85);
3. everything ``vmap``-ed over the batch, all shapes static.

Anchors outside the top-K are treated as non-keep (class -1), exactly
how the reference treats NMS-suppressed anchors (box.py:135-141).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from snn_for_object_detection_tpu.ops import boxes as box_ops

Array = jax.Array


def _greedy_nms_keep(
    sorted_boxes: Array, sorted_cid: Array, iou_threshold: float
) -> Array:
    """Greedy NMS over confidence-sorted boxes; same-class suppression.

    :param sorted_boxes: [K, 4] corner boxes, sorted by confidence desc.
    :param sorted_cid: [K] class ids (-1 = background).
    :return: [K] bool keep mask (background never kept).
    """
    k = sorted_boxes.shape[0]
    iou = box_ops.box_iou(sorted_boxes, sorted_boxes)  # [K, K]
    later = jnp.triu(jnp.ones((k, k), dtype=bool), 1)  # j > i
    same_class = sorted_cid[:, None] == sorted_cid[None, :]
    suppress_pair = later & same_class & (iou > iou_threshold)

    def body(i, keep):
        active = keep[i] & (sorted_cid[i] >= 0)
        return keep & ~(active & suppress_pair[i])

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), dtype=bool))
    return keep & (sorted_cid >= 0)


@partial(
    jax.jit,
    static_argnames=("nms_threshold", "pos_threshold", "max_out"),
)
def multibox_detection(
    cls_probs: Array,
    offset_preds: Array,
    anchors: Array,
    nms_threshold: float = 0.1,
    pos_threshold: float = 0.009999999,
    max_out: int = 300,
) -> Array:
    """Decode + NMS detection head outputs into final detections.

    :param cls_probs: [B, A, C+1] softmax class probabilities
        (channel 0 = background).
    :param offset_preds: [B, A, 4] predicted SSD offsets.
    :param anchors: [A, 4] corner-format anchors.
    :param max_out: Static number of output slots per image.
    :return: [B, max_out, 6] rows ``(class, conf, x1, y1, x2, y2)``,
        foreground-argmax anchors first (by confidence), then
        background; suppressed / background rows have class -1.
        Low-confidence rows (< pos_threshold) are demoted to background
        with conf replaced by ``1 - conf`` (box.py:146-148).
    """

    def one(cls_prob, offset_pred):
        conf = jnp.max(cls_prob, axis=1)
        cid = jnp.argmax(cls_prob, axis=1).astype(jnp.int32) - 1
        decoded = box_ops.decode_offsets(anchors, offset_pred)

        # Anchors whose argmax is background can never become
        # detections (box.py:85 iterates real classes only), so they
        # must not crowd foreground anchors out of the static top-K:
        # rank foreground-argmax anchors strictly first.
        rank = jnp.where(cid >= 0, conf, conf - 2.0)
        k = min(max_out, conf.shape[0])
        _, top_idx = jax.lax.top_k(rank, k)
        top_conf = conf[top_idx]
        top_cid = cid[top_idx]
        top_boxes = decoded[top_idx]

        keep = _greedy_nms_keep(top_boxes, top_cid, nms_threshold)
        out_cid = jnp.where(keep, top_cid, -1)

        below = top_conf < pos_threshold
        out_cid = jnp.where(below, -1, out_cid)
        out_conf = jnp.where(below, 1.0 - top_conf, top_conf)

        return jnp.concatenate(
            [
                out_cid[:, None].astype(decoded.dtype),
                out_conf[:, None],
                top_boxes,
            ],
            axis=1,
        )

    return jax.vmap(one)(cls_probs, offset_preds)


def filter_detections(dets: Array) -> Array:
    """Host-side helper: drop background rows (class < 0) from one
    image's detections. Returns a dynamically-sized array; for host /
    numpy consumption only (mAP accumulation, plotting)."""
    import numpy as np

    dets = np.asarray(dets)
    return dets[dets[:, 0] >= 0]
