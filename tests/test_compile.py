"""Spec-compiler tests: channel/shape inference, block semantics, BN,
state threading. Mirrors BlockGen behavior (generator.py:82-198)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S


def param_count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def run(block, x, train=False, state=None, stats=None, params=None, key=0):
    if params is None:
        params = block.init(jax.random.PRNGKey(key))
    if stats is None:
        stats = block.init_stats()
    if state is None:
        state = block.init_state(x.shape[0])
    ctx = C.Ctx(train=train)
    y, stats, state = block.apply(params, stats, state, x, ctx)
    return y, stats, state, params, ctx


def test_sequential_channels_and_shapes():
    cfg = [S.Conv(8, 3, 2), S.Norm(), S.LIF(), S.Pool("M"), S.Conv(16, 1)]
    blk = C.compile_block(cfg, 2, (16, 20))
    assert blk.out_channels == 16
    # conv s2: (8+2-3)//2+1: 16->8, 20->10; pool k2 s2: 4, 5
    assert blk.out_hw == (4, 5)
    x = jnp.ones((3, 16, 20, 2))
    y, *_ = run(blk, x)
    assert y.shape == (3, 4, 5, 16)


def test_residual_sums_branches():
    cfg = S.Residual([[S.Pass()], [S.Pass()]])
    blk = C.compile_block(cfg, 4, (4, 4))
    x = jnp.full((1, 4, 4, 4), 1.5)
    y, *_ = run(blk, x)
    np.testing.assert_allclose(np.asarray(y), 3.0)


def test_dense_concats_branches():
    cfg = S.Dense([[S.Conv(3, 1)], [S.Conv(5, 1)]])
    blk = C.compile_block(cfg, 2, (4, 4))
    assert blk.out_channels == 8
    x = jnp.ones((2, 4, 4, 2))
    y, *_ = run(blk, x)
    assert y.shape == (2, 4, 4, 8)


def test_residual_channel_mismatch_raises():
    with pytest.raises(ValueError, match="channel mismatch"):
        C.compile_block(S.Residual([[S.Conv(3, 1)], [S.Conv(5, 1)]]), 2, (4, 4))


def test_nested_blocks():
    inner = S.Residual([[S.Conv(4, 3)], [S.Pass()]])
    cfg = [S.Conv(4, 1), inner, S.Conv(6, 1)]
    blk = C.compile_block(cfg, 2, (8, 8))
    assert blk.out_channels == 6
    x = jnp.ones((1, 8, 8, 2))
    y, *_ = run(blk, x)
    assert y.shape == (1, 8, 8, 6)


def test_conv_matches_manual():
    blk = C.compile_block([S.Conv(4, 3, 1)], 2, (6, 6))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 6, 2)), jnp.float32)
    y, _, _, params, _ = run(blk, x)
    w = params["b0"]["l0"]["w"]
    exp = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(exp), rtol=1e-5)


def test_batchnorm_train_normalizes_and_updates_stats(rng):
    blk = C.compile_block([S.Norm()], 3, (5, 5))
    x = jnp.asarray(rng.normal(2.0, 3.0, (8, 5, 5, 3)), jnp.float32)
    y, stats, _, params, _ = run(blk, x, train=True)
    # Output normalized per channel
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # Running stats moved toward batch stats with momentum 0.1
    bm = np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(stats["b0"]["l0"]["mean"]), 0.1 * bm, rtol=1e-4, atol=1e-5
    )


def test_batchnorm_eval_uses_running_stats(rng):
    blk = C.compile_block([S.Norm()], 2, (4, 4))
    params = blk.init(jax.random.PRNGKey(0))
    stats = {"b0": {"l0": {"mean": jnp.asarray([1.0, -1.0]),
                           "var": jnp.asarray([4.0, 0.25])}}}
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
    ctx = C.Ctx(train=False)
    y, new_stats, _ = blk.apply(params, stats, blk.init_state(2), x, ctx)
    exp = (np.asarray(x) - [1.0, -1.0]) / np.sqrt([4.0, 0.25])
    np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-3, atol=1e-3)
    # Eval must not change running stats
    np.testing.assert_array_equal(
        np.asarray(new_stats["b0"]["l0"]["mean"]), np.asarray(stats["b0"]["l0"]["mean"])
    )


def test_lif_state_threads_through_block():
    blk = C.compile_block([S.Conv(4, 3), S.LIF()], 2, (6, 6))
    x = jnp.ones((1, 6, 6, 2))
    params = blk.init(jax.random.PRNGKey(0))
    stats = blk.init_stats()
    state = blk.init_state(1)
    ctx = C.Ctx()
    _, _, state1 = blk.apply(params, stats, state, x, ctx)
    _, _, state2 = blk.apply(params, stats, state1, x, ctx)
    v1 = np.asarray(state1["b0"]["l1"].v)
    v2 = np.asarray(state2["b0"]["l1"].v)
    assert not np.allclose(v1, v2)  # membrane integrates across calls


def test_pool_types():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    for kind, expect00 in [("A", (0 + 1 + 4 + 5) / 4), ("M", 5.0), ("S", 10.0)]:
        blk = C.compile_block([S.Pool(kind)], 1, (4, 4))
        y, *_ = run(blk, x)
        assert y.shape == (1, 2, 2, 1)
        np.testing.assert_allclose(float(y[0, 0, 0, 0]), expect00)


def test_upsample_nearest():
    x = jnp.asarray([[[[1.0], [2.0]], [[3.0], [4.0]]]])
    blk = C.compile_block([S.Up(2)], 1, (2, 2))
    y, *_ = run(blk, x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0])[:2, :2], 1.0)


def test_return_taps_and_out_shape():
    returns = []
    cfg = [S.Conv(4, 3, 2), S.Return(), S.Conv(8, 3, 2), S.Return()]
    blk = C.compile_block(cfg, 2, (16, 16), returns=returns)
    assert returns == [(4, (8, 8)), (8, (4, 4))]
    x = jnp.ones((1, 16, 16, 2))
    ctx = C.Ctx()
    y, _, _ = blk.apply(
        blk.init(jax.random.PRNGKey(0)), blk.init_stats(), blk.init_state(1), x, ctx
    )
    assert len(ctx.taps) == 2
    assert ctx.taps[0].shape == (1, 8, 8, 4)
    assert ctx.taps[1].shape == (1, 4, 4, 8)


def test_conv_lstm_state():
    blk = C.compile_block([S.LSTM()], 3, (4, 4))
    assert blk.out_channels == 3
    x = jnp.ones((2, 4, 4, 3))
    y, _, state, _, _ = run(blk, x)
    assert y.shape == (2, 4, 4, 3)
    h, c = state["b0"]["l0"]
    assert h.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(h))


def test_records_collected_when_flagged():
    blk = C.compile_block([S.Conv(4, 3), S.LIF(state_storage=True)], 2, (4, 4))
    x = jnp.ones((1, 4, 4, 2))
    ctx = C.Ctx(record=True)
    blk.apply(
        blk.init(jax.random.PRNGKey(0)), blk.init_stats(), blk.init_state(1), x, ctx
    )
    assert len(ctx.records) == 1
    (state, out), = ctx.records.values()
    assert out.shape == (1, 4, 4, 4)


def test_gradients_flow_through_block():
    cfg = [S.Conv(4, 3), S.Norm(), S.LIF(), S.Conv(2, 1)]
    blk = C.compile_block(cfg, 2, (6, 6))
    params = blk.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 6, 6, 2))

    def loss(p):
        # LIF needs >= 2 steps to spike from zero state (input lands in
        # the synaptic current after the spike test) — run 3 steps.
        stats, state = blk.init_stats(), blk.init_state(2)
        total = 0.0
        for _ in range(6):
            ctx = C.Ctx(train=True)
            y, stats, state = blk.apply(p, stats, state, x * 3, ctx)
            total = total + jnp.sum(y**2)
        return total

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # At least the final conv must receive nonzero gradient
    assert float(jnp.abs(g["b0"]["l3"]["w"]).sum()) > 0


# ---- round-2 DSL additions (VERDICT items: Up modes, ConvLSTM k>1,
# ---- max pool stride != kernel) ----


def test_upsample_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 5, 7, 3)).astype(np.float32)
    for mode in ("bilinear", "bicubic"):
        blk = C.compile_block([S.Up(2, mode=mode)], 3, (5, 7))
        assert blk.out_hw == (10, 14)
        y, *_ = run(blk, jnp.asarray(x))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode=mode
        ).permute(0, 2, 3, 1).numpy()
        # bilinear: exact kernel match (half-pixel centers). bicubic:
        # JAX's Keys a=-0.5 vs torch's a=-0.75 — close but not equal
        # (documented divergence in compile.py).
        tol = 1e-5 if mode == "bilinear" else 0.3
        np.testing.assert_allclose(np.asarray(y), ref, atol=tol)


def test_upsample_linear_aliases_and_bad_mode():
    x = jnp.ones((1, 2, 2, 1))
    for mode in ("linear", "trilinear"):
        blk = C.compile_block([S.Up(2, mode=mode)], 1, (2, 2))
        y, *_ = run(blk, x)
        assert y.shape == (1, 4, 4, 1)
    with pytest.raises(NotImplementedError):
        C.compile_block([S.Up(2, mode="lanczos")], 1, (2, 2))


def test_maxpool_overlapping_stride_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(2, 9, 11, 4)).astype(np.float32)
    blk = C.compile_block([S.Pool("M", kernel_size=3, stride=2)], 4, (9, 11))
    y, *_ = run(blk, jnp.asarray(x))
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2
    ).permute(0, 2, 3, 1).numpy()
    assert y.shape == ref.shape == (2, 4, 5, 4)
    np.testing.assert_allclose(np.asarray(y), ref)


def test_maxpool_overlapping_is_differentiable_under_remat():
    blk = C.compile_block([S.Pool("M", kernel_size=3, stride=1)], 1, (6, 6))

    @jax.checkpoint
    def f(x):
        y, *_ = run(blk, x)
        return jnp.sum(y ** 2)

    g = jax.grad(f)(jnp.arange(36.0).reshape(1, 6, 6, 1))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_conv_lstm_kernel3_same_padding_state_carries():
    blk = C.compile_block([S.LSTM(hidden_size=5, kernel_size=3)], 3, (6, 8))
    assert blk.out_channels == 5
    assert blk.out_hw == (6, 8)
    x = jnp.ones((2, 6, 8, 3))
    y, _, state, params, _ = run(blk, x)
    assert y.shape == (2, 6, 8, 5)
    # second step consumes the carried state without shape desync
    ctx = C.Ctx()
    y2, _, state2 = blk.apply(params, blk.init_stats(), state, x, ctx)
    assert y2.shape == (2, 6, 8, 5)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_conv_lstm_kernel3_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    in_ch, hidden, k, H, W = 3, 4, 3, 5, 6
    blk = C.compile_block([S.LSTM(hidden_size=hidden, kernel_size=k)],
                          in_ch, (H, W))
    params = blk.init(jax.random.PRNGKey(0))
    w = rng.normal(size=(k, k, in_ch + hidden, 4 * hidden)).astype(np.float32)
    params["b0"]["l0"]["w"] = jnp.asarray(w)

    conv = torch.nn.Conv2d(in_ch + hidden, 4 * hidden, k, padding=k // 2,
                           bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w).permute(3, 2, 0, 1))

    xs = rng.normal(size=(3, 2, H, W, in_ch)).astype(np.float32)
    state = blk.init_state(2)
    h = torch.zeros(2, hidden, H, W)
    c = torch.zeros(2, hidden, H, W)
    for t in range(3):
        y, _, state = blk.apply(params, blk.init_stats(), state,
                                jnp.asarray(xs[t]), C.Ctx())
        with torch.no_grad():
            gates = conv(torch.cat(
                [torch.from_numpy(xs[t]).permute(0, 3, 1, 2), h], dim=1))
            i_g, f_g, o_g, g_g = torch.split(gates, hidden, dim=1)
            c = torch.sigmoid(f_g) * c + torch.sigmoid(i_g) * torch.tanh(g_g)
            h = torch.sigmoid(o_g) * torch.tanh(c)
        np.testing.assert_allclose(
            np.asarray(y), h.permute(0, 2, 3, 1).numpy(), atol=2e-5
        )
