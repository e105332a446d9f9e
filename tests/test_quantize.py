"""Post-training int8 quantization (ops/quantize.py).

Pins: calibration covers every trunk conv, the quantized params tree
flows through forward/predict, binary-spike inputs quantize exactly,
and quantized predictions track the fp path closely on a real model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.ops import quantize as Q
from tests.test_detector import MicroSODa


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _model_and_data(rng, **kw):
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0, **kw)
    params, stats = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.random((4, 2, 32, 40, 2)) < 0.25, jnp.float32)
    return model, params, stats, X


def test_calibrate_covers_trunk_convs(rng):
    model, params, stats, X = _model_and_data(rng)
    absmax = Q.calibrate(model, params, stats, X)
    # every recorded path resolves to a conv leaf in params
    for path in absmax:
        node = params
        for p in path:
            node = node[p]
        assert set(node) == {"w"} and node["w"].ndim == 4
        assert absmax[path] >= 0.0  # 0 = conv never saw a spike; stays fp
    # the backbone entry conv (binary spike input) calibrates to 1.0
    entry = [p for p in absmax if p[0] == "backbone"]
    assert entry and any(abs(absmax[p] - 1.0) < 1e-6 for p in entry)


def test_quantize_roundtrip_and_exact_spikes(rng):
    """Per-channel int8 weights reconstruct within one quantum, and a
    binary-spike input is represented exactly."""
    model, params, stats, X = _model_and_data(rng)
    absmax = Q.calibrate(model, params, stats, X)
    qparams = Q.quantize(params, absmax)

    flat_q = [p for p, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]]
    assert any("w_q" in str(p) for p in flat_q)

    deq = Q.dequantize(qparams)

    def leaves_with_w(node, path=()):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                yield path, node["w"]
            for k, v in node.items():
                yield from leaves_with_w(v, path + (k,))

    orig = dict(leaves_with_w(params))
    back = dict(leaves_with_w(deq))
    for path, w in orig.items():
        if path in absmax:
            scale = np.abs(np.asarray(w)).reshape(-1, w.shape[-1]).max(0)
            np.testing.assert_allclose(
                np.asarray(back[path]), np.asarray(w),
                atol=float(scale.max()) / 127.0 + 1e-9,
            )

    # binary input quantizes exactly: x/(1/127) rounds to 0 or 127
    x = jnp.asarray(rng.random((8, 8)) < 0.3, jnp.float32)
    xs = 1.0 / 127.0
    qx = jnp.clip(jnp.round(x / xs), -127, 127) * xs
    np.testing.assert_allclose(np.asarray(qx), np.asarray(x), rtol=0,
                               atol=0)


def test_quantized_forward_tracks_fp(rng):
    """Quantized predictions stay close to fp32 on the micro model and
    flow through forward + predict unchanged in shape/structure."""
    model, params, stats, X = _model_and_data(rng)
    absmax = Q.calibrate(model, params, stats, X)
    qparams = Q.quantize(params, absmax)

    (cls_f, box_f), _, _ = model.forward(params, stats, X)
    (cls_q, box_q), _, _ = model.forward(qparams, stats, X)
    assert cls_q.shape == cls_f.shape and box_q.shape == box_f.shape
    # int8 PTQ tolerance: small model, shallow net -> tight tracking
    assert float(jnp.mean(jnp.abs(cls_q - cls_f))) < 0.05
    assert float(jnp.mean(jnp.abs(box_q - box_f))) < 0.05

    dets_q, _ = model.predict(qparams, stats, X[0], model.init_state(2))
    assert dets_q.shape[-1] == 6


def test_quantized_megakernel_builds(rng):
    """The megakernel dequantizes int8 leaves at build time."""
    from snn_for_object_detection_tpu.ops.megakernel import (
        StreamingMegakernel,
    )

    model, params, stats, X = _model_and_data(rng)
    absmax = Q.calibrate(model, params, stats, X)
    qparams = Q.quantize(params, absmax)
    mk = StreamingMegakernel(model, qparams, stats, use_pallas=False)
    (c, b), _ = mk.step(X[0, 0])
    (c_ref, b_ref), _, _, _ = model.step(
        params, stats, model.init_state(1), X[0, :1]
    )
    # dequantized fp weights track the original fp weights
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=0.2, atol=0.05)
