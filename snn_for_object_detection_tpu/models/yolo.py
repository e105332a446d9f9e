"""Scalable YOLO-SNN family: TinyYolo's topology with width/depth
multipliers (the YOLOv8 n/s/m/l scaling convention), for the
"YOLOv8-scale SNN on 1Mpx" configuration (BASELINE.json config 5).

``YoloSNN(scale="s")`` etc.; ``scale="tiny"`` reproduces the reference
TinyYolo channel/depth table exactly (tiny_yolo.py:16-51).
"""

from __future__ import annotations

from snn_for_object_detection_tpu.models.tiny_yolo import TinyYolo
from snn_for_object_detection_tpu.models.spec import Return

# (width multiplier vs TinyYolo's 64-base, extra C2f depth)
_SCALES = {
    "tiny": (1.0, 0),
    "s": (1.5, 1),
    "m": (2.0, 2),
    "l": (3.0, 2),
}


class YoloSNN(TinyYolo):
    """Width/depth-scaled TinyYolo.

    :param scale: One of ``tiny``, ``s``, ``m``, ``l``.
    """

    def __init__(self, *args, scale: str = "s", **kwargs):
        if scale not in _SCALES:
            raise ValueError(f"scale must be one of {sorted(_SCALES)}")
        self.scale = scale
        self._w, self._d = _SCALES[scale]
        super().__init__(*args, **kwargs)

    def _ch(self, base: int) -> int:
        # keep channels multiples of 16 (TPU lane friendliness)
        return max(16, int(base * self._w) // 16 * 16)

    def backbone_cfgs(self):
        return [
            *self._conv(self._ch(64), 3, 2),
            *self._c2f(self._ch(64), 2 + self._d),
            *self._conv(self._ch(128), 3, 2),
            *self._c2f(self._ch(128), 3 + self._d),
        ]

    def neck_cfgs(self):
        c = self._ch(256)
        return [
            *self._conv(c, 3, 2),
            *self._c2f(c, 4 + self._d),
            Return(),
            *self._conv(c, 3, 2),
            *self._c2f(c, 3 + self._d),
            Return(),
            *self._conv(c, 3, 2),
            *self._c2f(c, 2 + self._d),
            Return(),
        ]
