"""StableHLO deployment export (snn_for_object_detection_tpu/export.py).

Round-trips the streaming predict step through serialize/deserialize
and pins: detections match the live model bit-for-bit, the carried
state survives across frames, and reset() restarts the stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.export import export_predict, load_predict
from tests.test_detector import MicroSODa

H, W = 32, 40


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model = MicroSODa(num_classes=2, in_hw=(H, W), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("export") / "predict.stablehlo")
    export_predict(model, params, stats, path)
    return model, params, stats, path


def frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, 1, H, W, 2)) < 0.25).astype(np.uint8)


def test_roundtrip_matches_live_model(setup):
    model, params, stats, path = setup
    runner = load_predict(path)
    state = model.init_state(1)
    for x in frames(4):
        dets_live, state = model.predict(
            params, stats, jnp.asarray(x), state
        )
        dets_exp = runner(x)
        np.testing.assert_array_equal(
            np.asarray(dets_live), np.asarray(dets_exp)
        )


def test_reset_restarts_stream(setup):
    model, params, stats, path = setup
    runner = load_predict(path)
    first = [np.asarray(runner(x)) for x in frames(3, seed=1)]
    runner.reset()
    second = [np.asarray(runner(x)) for x in frames(3, seed=1)]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_int8_quantized_model_exports(setup, tmp_path):
    """Feature composition: an int8-PTQ params tree exports and serves
    through the same blob path (int8 convs serialize fine)."""
    from snn_for_object_detection_tpu.ops import quantize as Q

    model, params, stats, _ = setup
    X = jnp.asarray(frames(4), jnp.float32)
    qparams = Q.quantize(params, Q.calibrate(model, params, stats, X))
    path = str(tmp_path / "q.stablehlo")
    export_predict(model, qparams, stats, path)
    runner = load_predict(path)
    dets = runner(frames(1)[0])
    assert dets.shape[-1] == 6
    assert np.isfinite(np.asarray(dets)).all()


def test_loads_without_model_code(setup):
    """The blob is self-contained: loading touches only jax.export."""
    _, _, _, path = setup
    runner = load_predict(path)
    out = runner(frames(1)[0])
    assert out.shape[0] == 1 and out.shape[-1] == 6
    assert np.isfinite(np.asarray(out)).all()


def test_symbolic_batch_serves_any_camera_count(setup):
    """The default export has a symbolic batch: one blob serves B=1
    and B=3 (multi-camera) without re-export, and the batched stream
    matches per-stream results."""
    model, params, stats, path = setup
    runner = load_predict(path)
    rng = np.random.default_rng(3)
    seq = (rng.random((4, 3, H, W, 2)) < 0.25).astype(np.uint8)
    for x in seq:
        batched = np.asarray(runner(x))
    assert batched.shape[0] == 3
    # per-stream replay of camera 1 matches its row in the batch
    # a mid-stream batch change is refused (it would zero live states)
    with pytest.raises(ValueError, match="batch changed"):
        runner(seq[0][:1])
    runner.reset()
    for x in seq:
        single = np.asarray(runner(x[1:2]))
    np.testing.assert_array_equal(single[0], batched[1])
