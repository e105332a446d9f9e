"""Device mesh + sharding for data- and spatially-parallel training.

The TPU-native replacement for the reference's DDP/NCCL stack
(SURVEY.md §2.2-2.3): a ``jax.sharding.Mesh`` with the batch axis
sharded over ``data`` and — for geometries whose batch is smaller than
the chip count, like 1Mpx training at B=2 — the image-height axis
sharded over ``space``. Under ``jit``, GSPMD inserts the gradient
``psum`` over ICI automatically, BatchNorm's batch-mean becomes a
cross-replica reduction (sync-BN, config/config.yaml:76), and spatial
convolutions get halo exchanges at shard edges — no hand-written
collectives anywhere.

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
SPACE_AXIS = "space"


def make_mesh(
    devices: Optional[Sequence] = None,
    axis: str = DATA_AXIS,
    spatial: int = 1,
) -> Mesh:
    """Device mesh over ``devices`` (default: all).

    ``spatial=1`` (default): 1-D data-parallel mesh. ``spatial=k``:
    2-D ``(data, space)`` mesh with ``k`` devices along ``space`` —
    feature maps shard their height dim over ``space`` (see
    :func:`feature_sharding`), so a batch of B images can still use
    ``B*k`` chips. Adjacent mesh columns are adjacent devices, so the
    halo exchanges ride neighbor ICI links.
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    if spatial > 1:
        if devs.size % spatial:
            raise ValueError(
                f"{devs.size} devices not divisible by spatial={spatial}"
            )
        return Mesh(devs.reshape(-1, spatial), (axis, SPACE_AXIS))
    return Mesh(devs, (axis,))


def data_extent(mesh: Mesh) -> int:
    """Devices along the batch (``data``) axis of ``mesh``."""
    return mesh.shape.get(DATA_AXIS, mesh.size)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis_index: int) -> NamedSharding:
    """Sharding for an array whose batch dimension is at
    ``batch_axis_index`` (0 for [B, ...] labels, 1 for time-major
    [T, B, ...] features)."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def feature_sharding(
    mesh: Mesh, batch_axis_index: int = 1, height_axis_index: int = 2
) -> NamedSharding:
    """Sharding for feature maps: B over ``data`` and — on a 2-D
    ``(data, space)`` mesh — H over ``space``. Default axis positions
    match the time-major event tensor ``[T, B, H, W, C]``. Inside
    ``jit``, GSPMD keeps every conv/pool shard-local by exchanging
    halo rows at shard edges and turns BN's spatial mean into a
    cross-shard reduction — the model code never sees the split."""
    spec = [None] * (max(batch_axis_index, height_axis_index) + 1)
    spec[batch_axis_index] = DATA_AXIS
    if SPACE_AXIS in mesh.axis_names:
        spec[height_axis_index] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, features: Any, labels: Any):
    """Place a host batch onto the mesh, sharded along B (and along H
    over the ``space`` axis when ``mesh`` is 2-D).

    Single-process: a plain sharded ``device_put``. Multi-process: each
    host contributes its local batch as its slice of one global array
    (``jax.make_array_from_process_local_data``) — the global batch is
    ``per_host_batch * num_hosts``, matching DDP semantics where every
    rank loads its own batch (config/config.yaml:35-37).

    :param features: [T, B_local, H, W, C] numpy array.
    :param labels: [B_local, N, 5] numpy array.
    """
    f_sh, l_sh = feature_sharding(mesh), batch_sharding(mesh, 0)
    if jax.process_count() > 1:
        f = jax.make_array_from_process_local_data(f_sh, np.asarray(features))
        l = jax.make_array_from_process_local_data(l_sh, np.asarray(labels))
    else:
        f = jax.device_put(features, f_sh)
        l = jax.device_put(labels, l_sh)
    return f, l


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Wrap a host batch iterator with background device placement.

    A daemon thread pulls ``(features, labels)`` from ``iterator`` and
    calls :func:`shard_batch` up to ``size`` batches ahead of the
    consumer, so host rasterization + host->device transfer overlap
    the previous train step instead of serializing with it (the
    double-buffered prefetch from ROADMAP; ``jax.device_put`` is async,
    the thread only *enqueues* transfers). ``size <= 0`` degrades to
    synchronous per-batch placement.

    Worker exceptions re-raise at the consumer's ``next()``. The
    generator's ``close()`` stops the worker after its in-flight batch:
    the worker thread OWNS the wrapped iterator and closes it itself on
    exit (closing a generator from another thread while it is executing
    ``next()`` raises "generator already executing", so the consumer
    never touches it directly).
    """
    if size <= 0:
        for features, labels in iterator:
            yield shard_batch(mesh, features, labels)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def worker():
        try:
            for features, labels in iterator:
                if stop.is_set():
                    return
                q.put(("ok", shard_batch(mesh, features, labels)))
                if stop.is_set():
                    return
            q.put(("end", None))
        except BaseException as e:  # re-raised by the consumer
            q.put(("err", e))
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    t = threading.Thread(target=worker, daemon=True,
                         name="device-prefetch")
    t.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "ok":
                yield payload
            elif kind == "end":
                return
            else:
                raise payload
    finally:
        stop.set()
        # unblock the worker if it is parked on a full queue, then let
        # it finish its in-flight batch and close the source iterator
        try:
            q.get_nowait()
        except Exception:
            pass
        t.join(timeout=30.0)
