"""Box geometry: corner/center conversion, pairwise IoU, SSD offset codec.

Behavioral parity targets (clean-room re-derivation, same math):
- corner<->center:      /root/reference/utils/box.py:9-28
- pairwise IoU:         /root/reference/utils/box.py:31-59
- offset encode/decode: /root/reference/utils/box.py:62-79
  (SSD-style: ``10 * d(cxcy)/wh`` and ``5 * log(eps + wh ratio)``)

All functions are shape-static jnp ops; batching is done with ``vmap``
at the call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def corner_to_center(boxes: Array) -> Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Shape [..., 4]."""
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack(((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1), axis=-1)


def center_to_corner(boxes: Array) -> Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Shape [..., 4]."""
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack(
        (cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h), axis=-1
    )


def box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise IoU between two corner-format box lists.

    :param boxes1: [N, 4]
    :param boxes2: [M, 4]
    :return: [N, M]; entry (i, j) is IoU(boxes1[i], boxes2[j]).
    """
    areas1 = jnp.prod(boxes1[:, 2:] - boxes1[:, :2], axis=1)
    areas2 = jnp.prod(boxes2[:, 2:] - boxes2[:, :2], axis=1)
    inter_ul = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    inter_lr = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    inters = jnp.clip(inter_lr - inter_ul, min=0)
    inter_areas = jnp.prod(inters, axis=2)
    union = areas1[:, None] + areas2[None, :] - inter_areas
    return inter_areas / union


def encode_offsets(anchors: Array, assigned: Array, eps: float = 1e-6) -> Array:
    """Encode assigned GT boxes as SSD offsets relative to anchors.

    offset_xy = 10 * (gt_cxcy - anc_cxcy) / anc_wh
    offset_wh = 5 * log(eps + gt_wh / anc_wh)

    :param anchors: [N, 4] corner format.
    :param assigned: [N, 4] corner format.
    :return: [N, 4] offsets.
    """
    c_anc = corner_to_center(anchors)
    c_gt = corner_to_center(assigned)
    offset_xy = 10.0 * (c_gt[..., :2] - c_anc[..., :2]) / c_anc[..., 2:]
    offset_wh = 5.0 * jnp.log(eps + c_gt[..., 2:] / c_anc[..., 2:])
    return jnp.concatenate([offset_xy, offset_wh], axis=-1)


def decode_offsets(anchors: Array, offsets: Array) -> Array:
    """Inverse of :func:`encode_offsets`: predicted corner boxes.

    :param anchors: [N, 4] corner format.
    :param offsets: [N, 4] predicted offsets.
    :return: [N, 4] corner-format boxes.
    """
    anc = corner_to_center(anchors)
    xy = offsets[..., :2] * anc[..., 2:] / 10.0 + anc[..., :2]
    wh = jnp.exp(offsets[..., 2:] / 5.0) * anc[..., 2:]
    return center_to_corner(jnp.concatenate([xy, wh], axis=-1))
