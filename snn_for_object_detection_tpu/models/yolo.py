"""Scalable YOLO-SNN family: TinyYolo's topology with width/depth
multipliers (the YOLOv8 n/s/m/l scaling convention), for the
"YOLOv8-scale SNN on 1Mpx" configuration (BASELINE.json config 5).

``YoloSNN(scale="s")`` etc.; ``scale="tiny"`` reproduces the reference
TinyYolo channel/depth table exactly (tiny_yolo.py:16-51).
"""

from __future__ import annotations

from snn_for_object_detection_tpu.models.tiny_yolo import TinyYolo

# (width multiplier vs TinyYolo's 64-base, extra C2f depth)
_SCALES = {
    "tiny": (1.0, 0),
    "s": (1.5, 1),
    "m": (2.0, 2),
    "l": (3.0, 2),
}


class YoloSNN(TinyYolo):
    """Width/depth-scaled TinyYolo.

    Scaling rewrites the instance's stage plans: channels multiply by
    the width factor (rounded to a multiple of 16 for TPU lane
    friendliness) and every C2f deepens by the depth increment.

    :param scale: One of ``tiny``, ``s``, ``m``, ``l``.
    """

    def __init__(self, *args, scale: str = "s", **kwargs):
        if scale not in _SCALES:
            raise ValueError(f"scale must be one of {sorted(_SCALES)}")
        self.scale = scale
        width, extra_depth = _SCALES[scale]

        def ch(base: int) -> int:
            return max(16, int(base * width) // 16 * 16)

        self.backbone_plan = tuple(
            (ch(c), d + extra_depth) for c, d in TinyYolo.backbone_plan
        )
        self.neck_plan = tuple(
            (ch(c), d + extra_depth) for c, d in TinyYolo.neck_plan
        )
        super().__init__(*args, **kwargs)
