"""Model zoo tests: VggSNN families, PLIF/ALIF neuron variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models import VggSNN
from snn_for_object_detection_tpu.ops import neurons


def test_plif_matches_lif_at_init(rng):
    """softplus-initialized PLIF must reproduce vanilla LIF exactly."""
    shape = (2, 3)
    learn = neurons.plif_params_init(3)
    s_p = neurons.lif_init(shape)
    s_l = neurons.lif_init(shape)
    for _ in range(30):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32) * 2
        zp, s_p = neurons.plif_step(x, s_p, learn)
        zl, s_l = neurons.lif_step(x, s_l)
        np.testing.assert_allclose(np.asarray(zp), np.asarray(zl), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s_p.v), np.asarray(s_l.v), rtol=1e-4, atol=1e-6
        )


def test_plif_taus_receive_gradient():
    learn = neurons.plif_params_init(4)

    def loss(learn):
        s = neurons.lif_init((4,))
        out = 0.0
        for _ in range(10):
            z, s = neurons.plif_step(jnp.ones(4) * 2, s, learn)
            out = out + z.sum() + 0.01 * s.v.sum()
        return out

    g = jax.grad(loss)(learn)
    assert float(jnp.abs(g.raw_tau_mem).sum()) > 0
    assert float(jnp.abs(g.raw_tau_syn).sum()) > 0


def test_alif_threshold_adapts():
    """Constant drive: the adaptive threshold must rise after spiking,
    lengthening inter-spike intervals vs vanilla LIF."""
    p = neurons.ALIFParams(beta=0.5)
    s_a = neurons.alif_init((), p=p)
    s_l = neurons.lif_init(())
    spikes_a, spikes_l = 0, 0
    for _ in range(300):
        za, s_a = neurons.alif_step(jnp.asarray(3.0), s_a, p)
        zl, s_l = neurons.lif_step(jnp.asarray(3.0), s_l)
        spikes_a += int(za)
        spikes_l += int(zl)
    assert spikes_a < spikes_l
    assert spikes_a > 0
    assert float(s_a.b) > 0


@pytest.mark.parametrize("neuron", ["lif", "plif", "alif", "sli"])
def test_vgg_families_forward_and_grad(neuron):
    m = VggSNN(
        num_classes=2, in_hw=(64, 80), neuron=neuron,
        widths=(8, 12, 16), time_window=0,
    )
    params, stats = m.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(0).random((4, 1, 64, 80, 2)) < 0.4, jnp.float32
    )
    labels = jnp.asarray(
        np.array([[[0, 0.2, 0.2, 0.6, 0.6]]], np.float32)
    )

    def loss_fn(p):
        preds, _, _ = m.forward(p, stats, X, train=True)
        return m.loss(preds, labels)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_vgg_plif_has_tau_params():
    m = VggSNN(num_classes=2, in_hw=(64, 80), neuron="plif", widths=(8, 12, 16))
    params, _ = m.init(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tau_leaves = [p for p, _ in flat if "raw_tau" in str(p)]
    assert len(tau_leaves) > 0


def test_vgg_rejects_unknown_neuron():
    with pytest.raises(ValueError, match="neuron must be one of"):
        VggSNN(num_classes=2, in_hw=(64, 80), neuron="bogus")


def test_yolo_snn_scales():
    from snn_for_object_detection_tpu.models import YoloSNN

    tiny = YoloSNN(num_classes=2, in_hw=(64, 80), scale="tiny")
    s = YoloSNN(num_classes=2, in_hw=(64, 80), scale="s")

    def count(m):
        p, _ = m.init(jax.random.PRNGKey(0))
        return sum(x.size for x in jax.tree.leaves(p))

    n_tiny, n_s = count(tiny), count(s)
    assert n_s > 1.5 * n_tiny
    # "tiny" must reproduce the reference TinyYolo table exactly
    from snn_for_object_detection_tpu.models import TinyYolo

    ref = TinyYolo(num_classes=2, in_hw=(64, 80))
    assert n_tiny == count(ref)

    with pytest.raises(ValueError):
        YoloSNN(num_classes=2, in_hw=(64, 80), scale="xxl")


def test_yolo_snn_forward():
    from snn_for_object_detection_tpu.models import YoloSNN

    m = YoloSNN(num_classes=7, in_hw=(64, 80), scale="s", time_window=0)
    params, stats = m.init(jax.random.PRNGKey(0))
    X = jnp.asarray(
        np.random.default_rng(0).random((3, 1, 64, 80, 2)) < 0.3, jnp.float32
    )
    (cls_p, box_p), _, _ = m.forward(params, stats, X)
    assert cls_p.shape[-1] == 8  # 7 classes + background
