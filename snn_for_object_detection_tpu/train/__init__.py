"""Training orchestration: loop, metrics, checkpointing, loggers."""

from snn_for_object_detection_tpu.train.loggers import (
    CSVLogger,
    TensorBoardLogger,
)
from snn_for_object_detection_tpu.train.loop import Trainer
from snn_for_object_detection_tpu.train.metrics import MeanAveragePrecision

__all__ = [
    "CSVLogger",
    "MeanAveragePrecision",
    "TensorBoardLogger",
    "Trainer",
]
