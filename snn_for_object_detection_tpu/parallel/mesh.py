"""Device mesh + sharding for data-parallel training.

The TPU-native replacement for the reference's DDP/NCCL stack
(SURVEY.md §2.2-2.3): a 1-D ``jax.sharding.Mesh`` over all local (or
all global) devices with the batch axis sharded. Under ``jit``, GSPMD
inserts the gradient ``psum`` over ICI automatically, and BatchNorm's
batch-mean becomes a cross-replica reduction (sync-BN,
config/config.yaml:76) with no hand-written collectives.

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh; ``jax.devices()`` then spans all processes and the same code
scales across DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over ``devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis_index: int) -> NamedSharding:
    """Sharding for an array whose batch dimension is at
    ``batch_axis_index`` (0 for [B, ...] labels, 1 for time-major
    [T, B, ...] features)."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, features: Any, labels: Any):
    """Place a host batch onto the mesh, sharded along B.

    :param features: [T, B, H, W, C] numpy array.
    :param labels: [B, N, 5] numpy array.
    """
    f = jax.device_put(features, batch_sharding(mesh, 1))
    l = jax.device_put(labels, batch_sharding(mesh, 0))
    return f, l
