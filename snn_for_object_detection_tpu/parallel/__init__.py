"""Mesh construction, sharding helpers, and multi-host wiring."""

from snn_for_object_detection_tpu.parallel import distributed
from snn_for_object_detection_tpu.parallel.mesh import (
    batch_sharding,
    data_extent,
    feature_sharding,
    make_mesh,
    prefetch_to_device,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_extent",
    "distributed",
    "feature_sharding",
    "make_mesh",
    "prefetch_to_device",
    "replicated",
    "shard_batch",
]
