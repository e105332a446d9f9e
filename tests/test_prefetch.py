"""Device-prefetch iterator: ordering, device placement, error
propagation, prompt shutdown (ROADMAP async-prefetch item)."""

import numpy as np
import pytest

from snn_for_object_detection_tpu.parallel import (
    make_mesh,
    prefetch_to_device,
)


def _batches(n, fail_at=None):
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError("loader exploded")
        yield (np.full((3, 2, 4, 4, 2), i, np.uint8),
               np.full((2, 5, 5), float(i), np.float32))


def test_prefetch_preserves_order_and_places_on_device():
    import jax

    mesh = make_mesh(jax.devices()[:1])
    out = list(prefetch_to_device(_batches(5), mesh, size=2))
    assert len(out) == 5
    for i, (X, labels) in enumerate(out):
        assert int(np.asarray(X)[0, 0, 0, 0, 0]) == i
        assert isinstance(X, jax.Array)
        assert isinstance(labels, jax.Array)


def test_prefetch_zero_size_is_synchronous():
    import jax

    mesh = make_mesh(jax.devices()[:1])
    out = list(prefetch_to_device(_batches(3), mesh, size=0))
    assert [int(np.asarray(x)[0, 0, 0, 0, 0]) for x, _ in out] == [0, 1, 2]


def test_prefetch_propagates_loader_errors():
    import jax

    mesh = make_mesh(jax.devices()[:1])
    it = prefetch_to_device(_batches(10, fail_at=2), mesh, size=2)
    next(it)
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        for _ in it:
            pass


def test_prefetch_close_stops_infinite_source():
    import itertools
    import jax

    mesh = make_mesh(jax.devices()[:1])
    closed = []

    def infinite():
        try:
            for i in itertools.count():
                yield (np.zeros((3, 2, 4, 4, 2), np.uint8),
                       np.zeros((2, 5, 5), np.float32))
        finally:
            closed.append(True)

    it = prefetch_to_device(infinite(), mesh, size=2)
    next(it)
    it.close()
    # close() joins the worker, which owns and closes the source
    # generator on its way out — the finally above must have run
    assert closed == [True]
    with pytest.raises(StopIteration):
        next(it)
