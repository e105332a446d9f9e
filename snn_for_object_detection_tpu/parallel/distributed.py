"""Multi-host (multi-process) wiring.

The reference reaches multi-node through Lightning DDP — one config key
away (/root/reference/config/config.yaml:35-37). The TPU-native
equivalent: every process calls :func:`initialize` once, after which
``jax.devices()`` spans the whole pod slice and the SAME single-host
program (1-D data mesh + jit with batch shardings) scales across hosts;
GSPMD keeps gradient/batch-norm reductions on ICI.

Host responsibilities that remain explicit:

- each process feeds its own slice of the dataset
  (``PropheseeDataModule(host_id=..., num_hosts=...)`` — the Trainer
  fills these in automatically);
- per-host batches become one global array via
  :func:`global_batch` (``jax.make_array_from_process_local_data``);
- host-side metric accumulators are folded with :func:`allgather_pickle`
  before ``compute()`` (the torchmetrics dist-sync analogue);
- only process 0 writes logs and checkpoints.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import numpy as np

_COORD_ENV = "JAX_COORDINATOR_ADDRESS"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime (idempotent).

    With no arguments, reads the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``; on Cloud TPU pods all of them are inferred
    from the metadata server and none are needed).
    """
    if jax.distributed.is_initialized():
        return
    # NOTE: must run before anything touches the XLA backend
    # (jax.devices() etc.) — do not query process_count() here.
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get(_COORD_ENV)
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def local_rows(arr: jax.Array, batch_axis: int = 0) -> np.ndarray:
    """This process's rows of a batch-sharded global array, as numpy,
    in global row order. On a single host this is just the array."""
    if not is_distributed():
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[batch_axis].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards],
                          axis=batch_axis)


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point. Used at the end of
    ``Trainer.fit`` so fast ranks don't hit the jax.distributed
    shutdown barrier while rank 0 is still writing checkpoints."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def allgather_pickle(obj: Any) -> List[Any]:
    """Gather one picklable object per process onto every process.

    Variable-length safe: lengths are allgathered first, payloads are
    padded to the max. Used to fold per-host metric accumulators.
    """
    from jax.experimental import multihost_utils

    if not is_distributed():
        return [obj]
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    n = np.array([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]
