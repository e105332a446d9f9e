"""Host-side data pipeline: event decoding, rasterization, streaming."""

from snn_for_object_detection_tpu.data.psee import EventReader, write_dat
from snn_for_object_detection_tpu.data.prophesee import (
    DATASET_GEOMETRY,
    PropheseeDataModule,
    STStream,
    MTStream,
)

__all__ = [
    "DATASET_GEOMETRY",
    "EventReader",
    "MTStream",
    "PropheseeDataModule",
    "STStream",
    "write_dat",
]
