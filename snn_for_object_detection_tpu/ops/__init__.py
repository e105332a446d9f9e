"""Pure compute ops: neuron dynamics, box math, anchors, matching, NMS."""

from snn_for_object_detection_tpu.ops import (
    anchors,
    boxes,
    matching,
    neurons,
    nms,
    quantize,
)

__all__ = ["anchors", "boxes", "matching", "neurons", "nms", "quantize"]
