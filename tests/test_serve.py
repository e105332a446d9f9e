"""StreamingEngine: multi-camera serving API (serve.py).

Pins the production contract on top of the reference's streaming
promise (soda.py:202-233): per-stream state isolation under a shared
batched step, slot lifecycle (add/remove/reset), warm-up suppression,
and static-shape stability (no recompiles as cameras come and go).
"""

import jax
import numpy as np
import pytest

from snn_for_object_detection_tpu.serve import StreamingEngine
from tests.test_detector import MicroSODa

H, W = 32, 40


@pytest.fixture(scope="module")
def setup():
    model = MicroSODa(num_classes=2, in_hw=(H, W), time_window=2)
    params, stats = model.init(jax.random.PRNGKey(0))
    return model, params, stats


def frame(seed):
    return (np.random.default_rng(seed).random((H, W, 2)) < 0.2).astype(
        np.float32
    )


def test_lifecycle_and_outputs(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=4)
    eng.add_stream("a")
    eng.add_stream("b")
    assert sorted(eng.streams) == ["a", "b"]
    for t in range(5):
        out = eng.step({"a": frame(t), "b": frame(100 + t)})
        assert sorted(out) == ["a", "b"]
        for d in out.values():
            assert d.ndim == 2 and d.shape[1] == 6
            if t < model.time_window:  # warm-up suppression
                assert d.shape[0] == 0
    eng.remove_stream("a")
    assert eng.streams == ["b"]
    out = eng.step({"b": frame(9)})
    assert sorted(out) == ["b"]


def test_stream_state_isolation(setup):
    """Stream A's detections must be bit-identical whether or not other
    cameras share the chip — the batched step may not couple slots."""
    model, params, stats = setup
    frames_a = [frame(t) for t in range(6)]

    eng1 = StreamingEngine(model, params, stats, capacity=4)
    eng1.add_stream("a")
    solo = [eng1.step({"a": f})["a"] for f in frames_a]

    eng2 = StreamingEngine(model, params, stats, capacity=4)
    eng2.add_stream("x")
    eng2.step({"x": frame(500)})  # stagger: x is mid-stream when a joins
    eng2.add_stream("a")
    shared = []
    for t, f in enumerate(frames_a):
        out = eng2.step({"a": f, "x": frame(600 + t)})
        shared.append(out["a"])
    for s, m in zip(solo, shared):
        np.testing.assert_array_equal(s, m)


def test_slot_reuse_resets_state(setup):
    """A slot freed by remove_stream and reattached behaves as fresh:
    age suppression restarts and the recurrent state is zeroed."""
    model, params, stats = setup
    frames_c = [frame(t) for t in range(5)]

    eng = StreamingEngine(model, params, stats, capacity=1)
    eng.add_stream("old")
    for t in range(4):
        eng.step({"old": frame(50 + t)})
    eng.remove_stream("old")
    eng.add_stream("c")  # reuses the only slot
    reused = [eng.step({"c": f})["c"] for f in frames_c]

    fresh_eng = StreamingEngine(model, params, stats, capacity=1)
    fresh_eng.add_stream("c")
    fresh = [fresh_eng.step({"c": f})["c"] for f in frames_c]
    for r, f in zip(reused, fresh):
        np.testing.assert_array_equal(r, f)


def test_reset_stream(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=2)
    eng.add_stream("a")
    seq = [frame(t) for t in range(4)]
    first = [eng.step({"a": f})["a"] for f in seq]
    eng.reset_stream("a")
    second = [eng.step({"a": f})["a"] for f in seq]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_idle_stream_advances_with_zero_frame(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=2)
    eng.add_stream("a")
    eng.add_stream("b")
    out = eng.step({"a": frame(1)})  # b omitted -> zero frame
    assert sorted(out) == ["a", "b"]


def test_errors(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=1)
    eng.add_stream("a")
    with pytest.raises(KeyError):
        eng.add_stream("a")
    with pytest.raises(RuntimeError, match="capacity"):
        eng.add_stream("b")
    with pytest.raises(KeyError, match="unattached"):
        eng.step({"nope": frame(0)})
    with pytest.raises(ValueError, match="shape"):
        eng.step({"a": np.zeros((4, 4, 2), np.float32)})
    with pytest.raises(KeyError):
        eng.remove_stream("nope")


def test_update_weights_keeps_states(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=2)
    eng.add_stream("a")
    seq = [frame(t) for t in range(4)]
    for f in seq[:2]:
        eng.step({"a": f})
    eng.update_weights(params, stats)  # same weights -> same trajectory
    cont = [eng.step({"a": f})["a"] for f in seq[2:]]

    ref_eng = StreamingEngine(model, params, stats, capacity=2)
    ref_eng.add_stream("a")
    ref = [ref_eng.step({"a": f})["a"] for f in seq]
    for a, b in zip(cont, ref[2:]):
        np.testing.assert_array_equal(a, b)


def test_threshold_filters(setup):
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=1, threshold=2.0)
    eng.add_stream("a")
    for t in range(model.time_window + 2):
        out = eng.step({"a": frame(t)})
    assert out["a"].shape[0] == 0  # conf is a probability < 2.0


def test_sharded_engine_matches_single_device(setup):
    """Serving scale-out: the same streams on an 8-device sharded
    engine produce the detections of the unsharded engine (the batch
    axis is embarrassingly parallel; weights replicated)."""
    from snn_for_object_detection_tpu.parallel.mesh import make_mesh

    model, params, stats = setup
    mesh = make_mesh()
    assert mesh.size == 8  # conftest's virtual CPU mesh
    eng_a = StreamingEngine(model, params, stats, capacity=8)
    eng_b = StreamingEngine(model, params, stats, capacity=8, mesh=mesh)
    for eng in (eng_a, eng_b):
        eng.add_stream("a")
        eng.add_stream("b")
    for t in range(model.time_window + 3):
        fa = {"a": frame(t), "b": frame(100 + t)}
        out_a = eng_a.step(fa)
        out_b = eng_b.step(fa)
        for sid in ("a", "b"):
            np.testing.assert_allclose(
                out_a[sid], out_b[sid], rtol=1e-5, atol=1e-6
            )

    with pytest.raises(ValueError, match="divide"):
        StreamingEngine(model, params, stats, capacity=6, mesh=mesh)


def test_pipelined_mode_shifts_results_one_step(setup):
    """Pipelined (double-buffered) engine: step() returns the PREVIOUS
    frame's detections — same values as the synchronous engine, one
    call later, with flush() draining the final in-flight step."""
    model, params, stats = setup
    seq = [frame(t) for t in range(6)]

    sync_eng = StreamingEngine(model, params, stats, capacity=2)
    sync_eng.add_stream("a")
    expected = [sync_eng.step({"a": f})["a"] for f in seq]

    pipe_eng = StreamingEngine(
        model, params, stats, capacity=2, pipelined=True
    )
    pipe_eng.add_stream("a")
    assert pipe_eng.step({"a": seq[0]}) == {}  # nothing in flight yet
    got = [pipe_eng.step({"a": f})["a"] for f in seq[1:]]
    got.append(pipe_eng.flush()["a"])
    assert pipe_eng.flush() == {}  # drained
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_pipelined_remove_stream_keeps_pending(setup):
    """Detections in flight when a stream is removed still fan out
    (the dispatch-time slot snapshot, not the current slot map)."""
    model, params, stats = setup
    eng = StreamingEngine(
        model, params, stats, capacity=2, pipelined=True
    )
    eng.add_stream("a")
    for t in range(model.time_window + 1):
        eng.step({"a": frame(t)})
    eng.remove_stream("a")
    out = eng.flush()
    assert "a" in out and out["a"].shape[1] == 6


def test_frame_staging_dtypes_match(setup):
    """uint8 staging (default, 4x less H2D) is exact for binary event
    frames: detections match float32 staging bit-for-bit."""
    model, params, stats = setup
    eng8 = StreamingEngine(model, params, stats, capacity=2)
    eng32 = StreamingEngine(
        model, params, stats, capacity=2, frame_dtype="float32"
    )
    for eng in (eng8, eng32):
        eng.add_stream("a")
    for t in range(model.time_window + 3):
        f = frame(t)
        np.testing.assert_array_equal(
            eng8.step({"a": f})["a"], eng32.step({"a": f})["a"]
        )


def test_integer_staging_rejects_fractional_frames(setup):
    """uint8 staging must fail loud on normalized float inputs — a
    silent cast would truncate [0, 1) values to all-zero frames and
    detections would just disappear."""
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=2)
    eng.add_stream("a")
    with pytest.raises(ValueError, match="frame_dtype='float32'"):
        eng.step({"a": np.full((H, W, 2), 0.5, np.float32)})
    # integral-valued floats are fine (event counts arrive as floats
    # from many rasterizers)
    eng.step({"a": frame(0)})


def test_integer_staging_saturates_large_counts(setup):
    """Counts past the staging dtype max saturate instead of wrapping
    modulo 256 (a 256-event pixel must not stage as zero)."""
    model, params, stats = setup
    eng = StreamingEngine(model, params, stats, capacity=2)
    eng.add_stream("a")
    big = np.zeros((H, W, 2), np.float32)
    big[0, 0, 0] = 300.0
    big[0, 1, 0] = -1.0  # integral, passes the rint check
    eng.step({"a": big})
    assert eng._bufs[0].max() == 255  # saturated, not 300 % 256 == 44
    assert eng._bufs[0][0, 0, 1, 0] == 0  # -1 clips to 0, not 255


def test_pipelined_bad_frame_does_not_desync_buffers(setup):
    """A rejected frame must leave the pipelined double buffer exactly
    as it was: raising after the buffer flip would let a later step
    refill a host buffer whose transfer is still in flight. Behavioral
    pin: an engine that survives a bad step() yields bit-identical
    detections to one that never saw it."""
    model, params, stats = setup
    seq = [frame(t) for t in range(6)]

    clean = StreamingEngine(model, params, stats, capacity=2,
                            pipelined=True)
    hit = StreamingEngine(model, params, stats, capacity=2,
                          pipelined=True)
    for eng in (clean, hit):
        eng.add_stream("a")

    outs = {id(clean): [], id(hit): []}
    for t, f in enumerate(seq):
        if t == 3:
            flip_before = hit._flip
            with pytest.raises(ValueError, match="shape"):
                hit.step({"a": np.zeros((4, 4, 2), np.float32)})
            assert hit._flip == flip_before  # no flip on rejection
        for eng in (clean, hit):
            out = eng.step({"a": f})
            if out:
                outs[id(eng)].append(out["a"])
    for eng in (clean, hit):
        outs[id(eng)].append(eng.flush()["a"])
    for c, h in zip(outs[id(clean)], outs[id(hit)]):
        np.testing.assert_array_equal(c, h)


def test_int8_quantized_params(setup):
    """int8-PTQ params (ops/quantize.py) serve through the engine: the
    deployment combination the README advertises."""
    from snn_for_object_detection_tpu.ops import quantize as Q

    model, params, stats = setup
    X = np.stack([np.stack([frame(t), frame(50 + t)]) for t in range(4)])
    absmax = Q.calibrate(model, params, stats, jax.numpy.asarray(X))
    qparams = Q.quantize(params, absmax)
    eng = StreamingEngine(model, qparams, stats, capacity=2)
    eng.add_stream("a")
    for t in range(4):
        out = eng.step({"a": frame(t)})
        assert out["a"].shape[1] == 6 and np.isfinite(out["a"]).all()
