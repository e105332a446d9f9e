"""Space-to-depth stem execution plan (spec.Conv(s2d=True)).

The packed plan — 2x2 space-to-depth input + kernel-2 stride-1 conv
over 4x the channels — must be bit-for-bit the SAME function as the
plain 3x3 stride-2 conv it replaces (same ``[3,3,Cin,Cout]`` params,
same outputs, same gradients), differing only in how the MXU
contraction is laid out. These tests pin that identity at the layer,
int8-PTQ, and whole-model levels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.models.detector import SODa
from tests.test_detector import MicroSODa


def _pair(in_ch=2, out=16, hw=(8, 12), key=0):
    """Compile the same conv under both plans with identical params."""
    plain = C.compile_block([S.Conv(out, 3, 2)], in_ch, hw)
    packed = C.compile_block([S.Conv(out, 3, 2, s2d=True)], in_ch, hw)
    params = plain.init(jax.random.PRNGKey(key))
    # identical init: s2d is an execution plan, not a parameterization
    p2 = packed.init(jax.random.PRNGKey(key))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return plain, packed, params


def test_s2d_conv_matches_plain(rng):
    plain, packed, params = _pair()
    x = jnp.asarray(rng.normal(size=(3, 8, 12, 2)), jnp.float32)
    ctx = C.Ctx()
    y1, _, _ = plain.apply(params, plain.init_stats(), plain.init_state(3), x, ctx)
    y2, _, _ = packed.apply(params, packed.init_stats(), packed.init_state(3), x, ctx)
    assert y1.shape == y2.shape == (3, 4, 6, 16)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5
    )


def test_s2d_conv_gradients_match(rng):
    plain, packed, params = _pair()
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 2)), jnp.float32)

    def loss(blk):
        def f(p):
            y, _, _ = blk.apply(p, blk.init_stats(), blk.init_state(2), x, C.Ctx())
            return (y * y).sum()

        return f

    g1 = jax.grad(loss(plain))(params)
    g2 = jax.grad(loss(packed))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_s2d_requires_k3_s2_and_even_dims():
    with pytest.raises(ValueError, match="kernel_size=3"):
        C.compile_block([S.Conv(8, 1, 1, s2d=True)], 2, (8, 8))
    with pytest.raises(ValueError, match="even input dims"):
        C.compile_block([S.Conv(8, 3, 2, s2d=True)], 2, (7, 8))


def test_s2d_int8_ptq_matches_plain_int8(rng):
    """The int8-PTQ path packs the quantized weights/input the same
    way: int8 s2d == int8 plain (identical quant grid)."""
    from snn_for_object_detection_tpu.ops import quantize as Q

    plain, packed, params = _pair()
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 2)), jnp.float32)

    outs = {}
    for name, blk in (("plain", plain), ("packed", packed)):
        # calibrate: record in_absmax, then quantize the conv params
        ctx = C.Ctx(calibrate=True)
        _, stats, _ = blk.apply(params, blk.init_stats(), blk.init_state(2), x, ctx)
        qp = Q.quantize(params, Q._conv_absmax_paths(stats))

        def has_wq(node):
            if isinstance(node, dict):
                return "w_q" in node or any(
                    has_wq(v) for v in node.values()
                )
            return False

        assert has_wq(qp), "conv was not quantized"
        y, _, _ = blk.apply(qp, blk.init_stats(), blk.init_state(2), x, C.Ctx())
        outs[name] = np.asarray(y)
    np.testing.assert_allclose(
        outs["plain"], outs["packed"], rtol=1e-5, atol=1e-5
    )


def test_s2d_stem_model_matches_plain(rng):
    """SODa(s2d_stem=True): identical param tree (count + shapes) and
    forward/loss equal to the plain plan on the full detector."""
    kw = dict(num_classes=2, in_hw=(32, 40), time_window=0)
    m1 = MicroSODa(**kw)
    m2 = MicroSODa(s2d_stem=True, **kw)
    p1, s1 = m1.init(jax.random.PRNGKey(0))
    p2, s2 = m2.init(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    T, B = 3, 2
    X = jnp.asarray(
        (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    )
    (c1, b1), _, _ = m1.forward(p1, s1, X)
    (c2, b2), _, _ = m2.forward(p2, s2, X)
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(c2), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1), np.asarray(b2), rtol=1e-4, atol=1e-5
    )

    # the time-batched schedule uses the same conv apply -> same result
    (c3, b3), _, _ = m2.forward_seq(p2, s2, X)
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(c3), rtol=1e-4, atol=1e-5
    )


def test_s2d_stem_requires_conv_stem():
    class BadStem(SODa):
        def backbone_cfgs(self):
            return [S.Norm(), S.Conv(8, 3, 2)]

        def neck_cfgs(self):
            return [S.Conv(8, 3, 2), S.Return(),
                    S.Conv(8, 3, 2), S.Return()]

        def head_cfgs(self, box_out, cls_out):
            return [[S.Conv(kernel_size=1)], [S.Conv(box_out, 1)],
                    [S.Conv(cls_out, 1)]]

    with pytest.raises(ValueError, match="s2d_stem"):
        BadStem(num_classes=2, in_hw=(32, 40), s2d_stem=True)


def test_s2d_spec_survives_dataclass_replace():
    c = S.Conv(64, 3, 2)
    assert not c.s2d
    c2 = dataclasses.replace(c, s2d=True)
    assert c2.s2d and c2.out_channels == 64


def test_s2d_stem_on_spatial_mesh_matches_single_device(rng):
    """The packed stem under a (data=2 x space=4) mesh — the 1Mpx
    multi-chip training combo — must match one device at the
    loss+gradient level (GSPMD reshards the 2x2-block pack across the
    height shards; numerics must be unchanged)."""
    import jax.numpy as jnp

    from snn_for_object_detection_tpu.parallel import (
        feature_sharding,
        make_mesh,
        replicated,
        shard_batch,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")

    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0,
                      s2d_stem=True)
    params, stats = model.init(jax.random.PRNGKey(0))

    T, B = 3, 2
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels_j = jnp.asarray(labels)

    def loss_fn(p, stats, Xin):
        preds, _, _ = model.forward(p, stats, Xin, train=True)
        return model.loss(preds, labels_j)

    results = {}
    for name, mesh in (
        ("single", make_mesh(jax.devices()[:1])),
        ("dp2_sp4", make_mesh(jax.devices()[:8], spatial=4)),
    ):
        rep = replicated(mesh)
        step = jax.jit(
            jax.value_and_grad(loss_fn),
            in_shardings=(rep, rep, feature_sharding(mesh)),
            out_shardings=(rep, rep),
        )
        Xd, _ = shard_batch(mesh, X, labels)
        loss, grads = step(params, stats, Xd)
        results[name] = (float(loss), jax.device_get(grads))

    l1, g1 = results["single"]
    l8, g8 = results["dp2_sp4"]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)
