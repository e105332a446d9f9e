"""Mesh construction and sharding helpers (data parallelism)."""

from snn_for_object_detection_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch"]
