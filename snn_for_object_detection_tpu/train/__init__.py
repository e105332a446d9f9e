"""Training orchestration: loop, metrics, checkpointing."""

from snn_for_object_detection_tpu.train.metrics import MeanAveragePrecision
from snn_for_object_detection_tpu.train.loop import Trainer

__all__ = ["MeanAveragePrecision", "Trainer"]
