"""Time-batched forward (forward_seq) must be numerically equivalent
to the step-scan forward: the stateless layers commute with time, so
folding T into the batch is a pure schedule change.

Covers eval and train modes (per-step BN batch stats + gated running-
stat fold), random-start truncation, final-state equality (streaming
continuation), Residual/Dense nesting, multi-scale heads, and the
state-recording path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.models.detector import SODa


class SeqYolo(SODa):
    """Small detector exercising Residual + Dense + 2 scales."""

    def backbone_cfgs(self):
        return [
            S.Conv(8, 3, 2), S.Norm(), S.LIF(),
            S.Residual([[S.Conv(8, 3, 1), S.Norm(), S.LIF()], [S.Pass()]]),
        ]

    def neck_cfgs(self):
        return [
            S.Conv(16, 3, 2), S.Norm(), S.LIF(),
            S.Dense([[S.Conv(8, 1)], [S.Conv(8, 1)]]),
            S.Return(),
            S.Conv(16, 3, 2), S.Norm(), S.LIF(),
            S.Return(),
        ]

    def head_cfgs(self, box_out, cls_out):
        return [
            [S.Conv(kernel_size=1), S.Norm(), S.LI(state_storage=True),
             S.Tanh()],
            [S.Conv(box_out, 1)],
            [S.Conv(cls_out, 1)],
        ]


@pytest.fixture(scope="module")
def setup():
    m = SeqYolo(num_classes=2, in_hw=(24, 32))
    params, stats = m.init(jax.random.PRNGKey(0))
    # amplify BN gains so LIF layers genuinely spike
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: l * 3.0 if getattr(p[-1], "key", None) == "scale" else l,
        params,
    )
    rng = np.random.default_rng(5)
    X = jnp.asarray((rng.random((7, 2, 24, 32, 2)) < 0.4), jnp.float32)
    return m, params, stats, X


def _assert_tree_close(a, b, **kw):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), **kw
        ),
        a, b,
    )


@pytest.mark.parametrize("train", [False, True])
def test_forward_seq_matches_forward(setup, train):
    m, params, stats, X = setup
    preds_a, stats_a, state_a = m.forward(params, stats, X, train=train)
    preds_b, stats_b, state_b = m.forward_seq(params, stats, X, train=train)
    _assert_tree_close(preds_a, preds_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(state_a, state_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(stats_a, stats_b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("start", [2, 5])
def test_forward_seq_truncation(setup, start):
    """Traced random-start truncation: state and BN stats frozen for
    t < start, matching the step path's lax.cond gating."""
    m, params, stats, X = setup
    preds_a, stats_a, state_a = m.forward(
        params, stats, X, start_step=jnp.asarray(start), train=True
    )
    preds_b, stats_b, state_b = m.forward_seq(
        params, stats, X, start_step=jnp.asarray(start), train=True
    )
    _assert_tree_close(preds_a, preds_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(state_a, state_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(stats_a, stats_b, rtol=1e-5, atol=1e-6)


def test_forward_seq_streaming_continuation(setup):
    """Splitting a sequence into two forward_seq calls carrying state
    must equal one call (the O(1)-state streaming contract)."""
    m, params, stats, X = setup
    preds_full, _, state_full = m.forward_seq(params, stats, X)
    _, _, state_1 = m.forward_seq(params, stats, X[:3])
    preds_2, _, state_2 = m.forward_seq(params, stats, X[3:], state=state_1)
    _assert_tree_close(preds_full, preds_2, rtol=1e-5, atol=1e-6)
    _assert_tree_close(state_full, state_2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("start", [0, 3])
@pytest.mark.parametrize("schedule", ["forward_seq", "forward_hybrid"])
def test_forward_seq_train_grads_match_step_scan(setup, start, schedule):
    """Time-batched TRAINING (Trainer(time_batched=True/'hybrid')):
    the full train-path gradient — SSD loss through forward_seq /
    forward_hybrid with remat segments, Pallas masked temporal cells,
    traced truncation — must equal the step scan's, along with the
    loss and new BN stats."""
    m, params, stats, X = setup
    B = X.shape[1]
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels = jnp.asarray(labels)
    r = jnp.asarray(start, jnp.int32)

    def make(fwd):
        def loss_fn(p, stats):
            preds, new_stats, _ = fwd(p, stats, X, start_step=r,
                                      train=True)
            return m.loss(preds, labels), new_stats

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    (l1, s1), g1 = make(m.forward)(params, stats)
    (l2, s2), g2 = make(getattr(m, schedule))(params, stats)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    _assert_tree_close(s1, s2, rtol=1e-5, atol=1e-7)
    _assert_tree_close(g1, g2, rtol=1e-4, atol=1e-6)


def test_forward_hybrid_matches_forward_eval(setup):
    """Hybrid schedule at eval: predictions, final state and stats all
    equal the step scan's (streaming-continuation-safe)."""
    m, params, stats, X = setup
    preds_a, stats_a, state_a = m.forward(params, stats, X)
    preds_b, stats_b, state_b = m.forward_hybrid(params, stats, X)
    _assert_tree_close(preds_a, preds_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(state_a, state_b, rtol=1e-5, atol=1e-6)
    _assert_tree_close(stats_a, stats_b, rtol=1e-5, atol=1e-6)


def test_forward_seq_jit_and_grad(setup):
    """forward_seq composes with jit and grad (eval-throughput path is
    jitted; grads exist even if training keeps the step scan)."""
    m, params, stats, X = setup

    @jax.jit
    def f(params):
        (cls_p, box_p), _, _ = m.forward_seq(params, stats, X, train=True)
        return jnp.sum(cls_p ** 2) + jnp.sum(jnp.abs(box_p))

    g = jax.grad(f)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_forward_seq_fused_matches_unfused(setup, monkeypatch):
    """fuse_seq=True routes eligible [Conv3x3 s1 -> Norm -> LIF/LI]
    triples through the fused temporal Pallas kernel; outputs and final
    state must match the unfused seq path (fp32: exact up to matmul
    accumulation order)."""
    m, params, stats, X = setup
    mf = SeqYolo(num_classes=2, in_hw=(24, 32), fuse_seq=True)
    # guard against silent plan regressions: the kernel must really run
    import snn_for_object_detection_tpu.ops.pallas_kernels as pk

    calls = []
    orig = pk.spiking_conv_seq
    monkeypatch.setattr(
        pk, "spiking_conv_seq",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    preds_a, stats_a, state_a = m.forward_seq(params, stats, X)
    preds_b, stats_b, state_b = mf.forward_seq(params, stats, X)
    assert calls, "fused plan was empty — spiking_conv_seq never ran"
    _assert_tree_close(preds_a, preds_b, rtol=1e-4, atol=1e-5)
    _assert_tree_close(state_a, state_b, rtol=1e-4, atol=1e-5)
    _assert_tree_close(stats_a, stats_b, rtol=1e-5, atol=1e-6)


def test_forward_seq_fused_fallback_paths(setup):
    """Training mode and truncation masks must bypass the fused kernel
    (it implements eval BN + no gating) and still be correct."""
    m, params, stats, X = setup
    mf = SeqYolo(num_classes=2, in_hw=(24, 32), fuse_seq=True)
    for kw in [dict(train=True), dict(start_step=jnp.asarray(3))]:
        preds_a, stats_a, _ = m.forward_seq(params, stats, X, **kw)
        preds_b, stats_b, _ = mf.forward_seq(params, stats, X, **kw)
        _assert_tree_close(preds_a, preds_b, rtol=1e-5, atol=1e-6)
        _assert_tree_close(stats_a, stats_b, rtol=1e-5, atol=1e-6)


def test_forward_seq_records(setup):
    """Record mode: per-layer (state, out) sequences time-stacked,
    matching forward_with_records."""
    m, params, stats, X = setup
    import snn_for_object_detection_tpu.models.compile as C

    ctx = C.Ctx(train=False, record=True)
    state = m.init_state(2)
    _ = m.backbone.apply_seq(
        params["backbone"], stats["backbone"], state["backbone"],
        X, ctx,
    )
    # SeqYolo flags only the head LI; backbone has no recorders
    assert ctx.records == {}

    # drive the full seq path with the head recorder
    ctx2 = C.Ctx(train=False, record=True)
    y, _, _ = m.backbone.apply_seq(
        params["backbone"], stats["backbone"], state["backbone"], X, ctx2
    )
    _ = m.neck.apply_seq(
        params["neck"], stats["neck"], state["neck"], y, ctx2
    )
    fmap = ctx2.taps[0]
    _, _, _ = m.heads[0]["base"].apply_seq(
        params["head0"]["base"], stats["head0"]["base"],
        state["head0"]["base"], fmap, ctx2,
    )
    assert len(ctx2.records) == 1
    (st_seq, out_seq) = next(iter(ctx2.records.values()))
    assert out_seq.shape[0] == X.shape[0]  # time-stacked
    assert st_seq.v.shape[0] == X.shape[0]


@pytest.mark.parametrize(
    "fp8", [jnp.float8_e4m3fn, jnp.float8_e5m2],
    ids=["e4m3", "e5m2"],
)
def test_fp8_state_storage_runs_and_correlates(setup, fp8):
    """fp8 neuron-state storage is a supported opt-in — e5m2 is the
    shipped headline inference dtype (docs/perf.md round-5: +16-36%
    over bf16 states, mAP50 delta inside run noise), e4m3 the
    accuracy-caveated alternative: forward must be finite and strongly
    correlated with the fp32-state reference — not equal (the membrane
    quantizes near threshold)."""
    m, params, stats, X = setup
    m8 = SeqYolo(num_classes=2, in_hw=(24, 32), state_dtype=fp8)
    # longer sequence so spike activity reaches the analog head
    X = jnp.concatenate([X, X, X], axis=0)
    (cls_ref, _), _, _ = m.forward(params, stats, X)
    (cls_8, _), _, state8 = m8.forward(params, stats, X)
    assert float(jnp.std(cls_ref)) > 1e-3  # ref must be non-degenerate
    assert np.isfinite(np.asarray(cls_8)).all()
    # state really stored in fp8
    leaves = jax.tree_util.tree_leaves(state8)
    assert any(l.dtype == fp8 for l in leaves)
    a = np.asarray(cls_ref, np.float64).ravel()
    b = np.asarray(cls_8, np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr
