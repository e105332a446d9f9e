"""Cross-framework parity: JAX stack vs torch implementation of the
reference semantics, with SHARED weights.

BASELINE.json's fidelity bar is "identical spike trains at fp32, box
decode within 1e-5". norse itself is not installed here, so the torch
side implements the exact norse cell math (SURVEY.md §2.5) plus
torch-native Conv2d/BatchNorm2d — i.e., the reference's compute stack.
Weights are copied from the JAX model (HWIO -> OIHW), and both run the
same binary event input for several time steps.

This pins down the subtle semantics: LIF order of operations (decay ->
spike -> reset -> inject), BN per-step running-stat updates, conv
padding arithmetic, NHWC<->NCHW layout equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S


def torch_lif_step(x, state):
    """norse lif_feed_forward_step (SURVEY.md §2.5), fp32."""
    if state is None:
        v = torch.zeros_like(x)
        i = torch.zeros_like(x)
    else:
        v, i = state
    dv = 1e-3 * 100.0 * (0.0 - v + i)
    v_dec = v + dv
    i_dec = i - 1e-3 * 200.0 * i
    z = (v_dec - 1.0 > 0).float()
    v_new = (1 - z) * v_dec
    i_new = i_dec + x
    return z, (v_new, i_new)


def torch_li_step(x, state):
    if state is None:
        v = torch.zeros_like(x)
        i = torch.zeros_like(x)
    else:
        v, i = state
    i_jump = i + x
    v_new = v + 1e-3 * 100.0 * (0.0 - v + i_jump)
    i_dec = i_jump - 1e-3 * 200.0 * i_jump
    return v_new, (v_new, i_dec)


CFG = [S.Conv(8, 3, 2), S.Norm(), S.LIF(), S.Conv(12, 1), S.Norm(), S.LIF()]


def build_jax(key):
    blk = C.compile_block(CFG, 2, (24, 32))
    params = blk.init(key)
    return blk, params


def build_torch(params):
    convs = []
    bns = []
    for li, spec in enumerate(CFG):
        p = params["b0"][f"l{li}"]
        if isinstance(spec, S.Conv):
            w = np.asarray(p["w"])  # HWIO
            conv = torch.nn.Conv2d(
                w.shape[2], w.shape[3], w.shape[0],
                stride=spec.stride, padding=spec.kernel_size // 2,
                bias=False,
            )
            conv.weight.data = torch.from_numpy(
                np.transpose(w, (3, 2, 0, 1)).copy()  # HWIO -> OIHW
            )
            convs.append(conv)
        elif isinstance(spec, S.Norm):
            bn = torch.nn.BatchNorm2d(len(np.asarray(p["scale"])))
            bn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
            bn.bias = None
            bns.append(bn)
    return convs, bns


@pytest.mark.parametrize("train", [True, False])
def test_spike_train_parity(train, rng):
    blk, params = build_jax(jax.random.PRNGKey(3))
    convs, bns = build_torch(params)
    for bn in bns:
        bn.train(train)

    stats = blk.init_stats()
    state = blk.init_state(2)
    t_state = [None, None]

    X = (rng.random((10, 2, 24, 32, 2)) < 0.5).astype(np.float32)

    with torch.no_grad():
        for t in range(10):
            # --- jax (NHWC) ---
            ctx = C.Ctx(train=train)
            yj, stats, state = blk.apply(
                params, stats, state, jnp.asarray(X[t]), ctx
            )
            # --- torch (NCHW), reference layer order conv->bn->lif ---
            xt = torch.from_numpy(np.transpose(X[t], (0, 3, 1, 2)).copy())
            h = convs[0](xt)
            h = bns[0](h)
            z1, t_state[0] = torch_lif_step(h, t_state[0])
            h = convs[1](z1)
            h = bns[1](h)
            z2, t_state[1] = torch_lif_step(h, t_state[1])

            yt = np.transpose(z2.numpy(), (0, 2, 3, 1))
            # spike trains must be IDENTICAL (binary)
            np.testing.assert_array_equal(
                np.asarray(yj), yt, err_msg=f"spike mismatch at t={t}"
            )

    # BN running stats must match torch's update rule
    if train:
        j_mean = np.asarray(stats["b0"]["l1"]["mean"])
        t_mean = bns[0].running_mean.numpy()
        np.testing.assert_allclose(j_mean, t_mean, rtol=1e-4, atol=1e-6)
        j_var = np.asarray(stats["b0"]["l1"]["var"])
        t_var = bns[0].running_var.numpy()
        np.testing.assert_allclose(j_var, t_var, rtol=1e-4, atol=1e-6)


def test_membrane_potential_parity(rng):
    """Analog (LI) head readout must match to fp32 tolerance."""
    blk, params = None, None
    cfg = [S.Conv(6, 3, 1), S.Norm(), S.LI()]
    blk = C.compile_block(cfg, 2, (16, 16))
    params = blk.init(jax.random.PRNGKey(1))

    conv = torch.nn.Conv2d(2, 6, 3, padding=1, bias=False)
    w = np.asarray(params["b0"]["l0"]["w"])
    conv.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    bn = torch.nn.BatchNorm2d(6)
    bn.weight.data = torch.from_numpy(
        np.asarray(params["b0"]["l1"]["scale"]).copy()
    )
    bn.bias = None
    bn.train(False)

    stats = blk.init_stats()
    state = blk.init_state(1)
    t_state = None
    X = (rng.random((8, 1, 16, 16, 2)) < 0.5).astype(np.float32)
    with torch.no_grad():
        for t in range(8):
            ctx = C.Ctx(train=False)
            yj, stats, state = blk.apply(
                params, stats, state, jnp.asarray(X[t]), ctx
            )
            xt = torch.from_numpy(np.transpose(X[t], (0, 3, 1, 2)).copy())
            h = bn(conv(xt))
            v, t_state = torch_li_step(h, t_state)
            np.testing.assert_allclose(
                np.asarray(yj),
                np.transpose(v.numpy(), (0, 2, 3, 1)),
                rtol=1e-4, atol=1e-5,
            )


def test_conv_stride2_spatial_parity(rng):
    """Explicit k//2 padding must reproduce torch's output geometry and
    values for stride-2 convs on even inputs (SAME would not)."""
    cfg = [S.Conv(4, 3, 2)]
    blk = C.compile_block(cfg, 2, (10, 14))
    params = blk.init(jax.random.PRNGKey(2))
    conv = torch.nn.Conv2d(2, 4, 3, stride=2, padding=1, bias=False)
    w = np.asarray(params["b0"]["l0"]["w"])
    conv.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())

    x = rng.normal(size=(1, 10, 14, 2)).astype(np.float32)
    ctx = C.Ctx()
    yj, _, _ = blk.apply(params, blk.init_stats(), blk.init_state(1),
                         jnp.asarray(x), ctx)
    with torch.no_grad():
        yt = conv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    np.testing.assert_allclose(
        np.asarray(yj),
        np.transpose(yt.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )
