"""Detector core tests: a small SODa subclass end-to-end on CPU, plus
TinyYolo structure checks vs. the reference geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models import SODa, TinyYolo
from snn_for_object_detection_tpu.models.spec import (
    Conv,
    LI,
    LIF,
    Norm,
    Return,
    Tanh,
)


class MicroSODa(SODa):
    """Tiny 2-scale detector for fast CPU tests."""

    def backbone_cfgs(self):
        return [Conv(8, 3, 2), Norm(), LIF()]

    def neck_cfgs(self):
        return [
            Conv(8, 3, 2), Norm(), LIF(), Return(),
            Conv(8, 3, 2), Norm(), LIF(), Return(),
        ]

    def head_cfgs(self, box_out, cls_out):
        return [
            [Conv(kernel_size=1), Norm(), LI(), Tanh()],
            [Conv(box_out, 1)],
            [Conv(cls_out, 1)],
        ]


@pytest.fixture(scope="module")
def micro():
    return MicroSODa(num_classes=2, in_hw=(32, 40), time_window=4)


@pytest.fixture(scope="module")
def micro_vars(micro):
    return micro.init(jax.random.PRNGKey(0))


def test_anchor_count(micro):
    # 32x40 -> /2 -> /2 = (8,10), /2 = (4,5); 9 anchors/pixel
    assert micro.neck_out_shape == [(8, (8, 10)), (8, (4, 5))]
    assert micro.num_anchors == 9 * (80 + 20)


def test_step_shapes(micro, micro_vars):
    params, stats = micro_vars
    state = micro.init_state(2)
    x = jnp.ones((2, 32, 40, 2))
    (cls_p, box_p), new_stats, new_state, _ = micro.step(
        params, stats, state, x, train=False
    )
    assert cls_p.shape == (2, micro.num_anchors, 3)
    assert box_p.shape == (2, micro.num_anchors, 4)
    # state pytree structure must be stable (scan carry requirement)
    assert jax.tree.structure(new_state) == jax.tree.structure(state)
    assert jax.tree.structure(new_stats) == jax.tree.structure(stats)


def test_forward_matches_manual_steps(micro, micro_vars):
    """forward(X, start_step=r) == stepping X[r:] by hand (soda.py:149)."""
    params, stats = micro_vars
    T, B = 12, 1
    X = jnp.asarray(
        np.random.default_rng(1).random((T, B, 32, 40, 2)) < 0.5, jnp.float32
    )
    r = 2
    # train=True: BN batch-normalization lets the untrained LIF cascade
    # reach threshold within a short test sequence.
    (cls_f, box_f), _, _ = micro.forward(params, stats, X, start_step=r, train=True)

    state = micro.init_state(B)
    st = stats
    for t in range(r, T):
        (cls_m, box_m), st, state, _ = micro.step(params, st, state, X[t], train=True)
    assert float(jnp.abs(cls_m).sum()) > 0  # non-vacuous comparison
    np.testing.assert_allclose(
        np.asarray(cls_f), np.asarray(cls_m), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(box_f), np.asarray(box_m), rtol=1e-5, atol=1e-5
    )


def test_forward_start_zero_uses_all_steps(micro, micro_vars):
    params, stats = micro_vars
    X = jnp.asarray(
        np.random.default_rng(2).random((12, 1, 32, 40, 2)) < 0.5, jnp.float32
    )
    (cls0, _), _, _ = micro.forward(params, stats, X, start_step=0, train=True)
    (cls8, _), _, _ = micro.forward(params, stats, X, start_step=8, train=True)
    assert float(jnp.abs(cls0).sum()) > 0
    assert not np.allclose(np.asarray(cls0), np.asarray(cls8))


def test_loss_finite_and_differentiable(micro, micro_vars):
    params, stats = micro_vars
    X = jnp.asarray(
        np.random.default_rng(3).random((10, 2, 32, 40, 2)) < 0.5, jnp.float32
    )
    labels = np.full((2, 4, 5), -1.0, np.float32)
    labels[0, 0] = [0, 0.2, 0.2, 0.5, 0.6]
    labels[1, 0] = [1, 0.5, 0.1, 0.9, 0.5]
    labels = jnp.asarray(labels)

    def loss_fn(p):
        preds, _, _ = micro.forward(p, stats, X, train=True)
        return micro.loss(preds, labels)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    # Most params must receive gradient (spike sparsity can zero a few)
    assert nonzero >= len(leaves) * 2 // 3, (nonzero, len(leaves))


def test_predict_streaming(micro, micro_vars):
    params, stats = micro_vars
    x = jnp.asarray(
        np.random.default_rng(4).random((32, 40, 2)) < 0.2, jnp.float32
    )
    state = None
    for _ in range(3):
        dets, state = micro.predict(params, stats, x, state, max_out=20)
    assert dets.shape == (20, 6)
    d = np.asarray(dets)
    boxes = d[:, 2:]
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0


def test_forward_with_records():
    m = MicroRecorder = None  # placeholder to keep name local

    class RecSODa(MicroSODa):
        def backbone_cfgs(self):
            return [Conv(8, 3, 2), Norm(), LIF(state_storage=True)]

    m = RecSODa(num_classes=2, in_hw=(32, 40))
    params, stats = m.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(5).random((4, 1, 32, 40, 2)) < 0.1, jnp.float32
    )
    preds, _, _, records = m.forward_with_records(params, stats, X)
    assert len(records) == 1
    (state_rec, spikes), = records.values()
    assert spikes.shape[0] == 4  # time-stacked
    assert state_rec.v.shape[0] == 4


def test_tiny_yolo_structure():
    """TinyYolo on GEN1 geometry: pyramid strides 8/16/32 and the
    reference anchor count 9 * 1505 = 13545."""
    m = TinyYolo(num_classes=2, in_hw=(240, 304))
    assert [hw for _, hw in m.neck_out_shape] == [(30, 38), (15, 19), (8, 10)]
    assert [ch for ch, _ in m.neck_out_shape] == [256, 256, 256]
    assert m.num_anchors == 13545
    params, _ = m.init(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(params))
    # Exact parity with a torch replica of the reference generator
    # (README.md:39 says "~3M"; the true count of the reference
    # architecture is 4,228,544).
    assert n == 4_228_544, n


def test_spike_analysis_from_records():
    """StateStorage-analogue end-to-end: record -> analyze."""
    from snn_for_object_detection_tpu.utils.analysis import spike_stats

    class RecSODa(MicroSODa):
        def backbone_cfgs(self):
            return [Conv(8, 3, 2), Norm(), LIF(state_storage=True)]

    m = RecSODa(num_classes=2, in_hw=(32, 40))
    params, stats = m.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(6).random((8, 2, 32, 40, 2)) < 0.5, jnp.float32
    )
    _, _, _, records = m.forward_with_records(params, stats, X)
    report = spike_stats(records)
    assert len(report) == 1
    (layer_stats,) = report.values()
    assert 0.0 <= layer_stats["firing_rate"] <= 1.0
    assert 0.0 <= layer_stats["dead_fraction"] <= 1.0
    assert "v_mean" in layer_stats


def test_scan_unroll_parity(micro_vars):
    """unroll=2 must produce identical results to unroll=1."""
    params, stats = micro_vars
    from tests.test_detector import MicroSODa

    X = jnp.asarray(
        np.random.default_rng(7).random((6, 1, 32, 40, 2)) < 0.5, jnp.float32
    )
    outs = []
    for unroll in (1, 2):
        m = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=4,
                      scan_unroll=unroll)
        (cls_p, box_p), _, _ = m.forward(params, stats, X, train=True)
        outs.append(np.asarray(cls_p))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_loss_rejects_mt_labels(micro, micro_vars):
    params, stats = micro_vars
    preds = (
        jnp.zeros((1, micro.num_anchors, 3)),
        jnp.zeros((1, micro.num_anchors, 4)),
    )
    mt_labels = jnp.zeros((1, 3, 6))  # (frame_idx, class, xyxy)
    with pytest.raises(ValueError, match="single-target"):
        micro.loss(preds, mt_labels)


def test_custom_anchor_params():
    """anchor_sizes/anchor_ratios ctor overrides (data-driven anchors,
    scripts/calc_anchors.py) change the anchor table and the head
    channel plan consistently."""
    sizes = [[0.1, 0.3], [0.4, 0.7]]
    ratios = [0.8, 1.25]
    m = MicroSODa(num_classes=2, in_hw=(32, 40), anchor_sizes=sizes,
                  anchor_ratios=ratios)
    assert m.anchors_per_pixel == 4  # 2 sizes x 2 ratios
    assert m.num_box_out == 16 and m.num_class_out == 12
    # anchors actually reflect the custom table: widest anchor ~ 0.7
    w = np.asarray(m.anchors[:, 2] - m.anchors[:, 0])
    assert 0.5 < w.max() < 1.2
    params, stats = m.init(jax.random.PRNGKey(0))
    X = jnp.zeros((2, 1, 32, 40, 2))
    (cls_p, box_p), _, _ = m.forward(params, stats, X)
    assert cls_p.shape == (1, m.num_anchors, 3)
    assert box_p.shape == (1, m.num_anchors, 4)

    with pytest.raises(ValueError, match="anchor_sizes"):
        MicroSODa(num_classes=2, in_hw=(32, 40), anchor_sizes=[0.1, 0.2])


def test_forward_fn_dispatch():
    """forward_fn is the single schedule dispatch point shared by the
    Trainer and the schedule benchmarks."""
    m = MicroSODa(num_classes=2, in_hw=(32, 40))
    assert m.forward_fn(False) == m.forward
    assert m.forward_fn(True) == m.forward_seq
    assert m.forward_fn("hybrid") == m.forward_hybrid
    with pytest.raises(ValueError, match="schedule"):
        m.forward_fn("nope")
    with pytest.raises(ValueError, match="schedule"):
        m.forward_fn(None)
