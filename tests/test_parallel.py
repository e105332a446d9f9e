"""Data-parallel correctness on the 8-device virtual CPU mesh.

The TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4): the same train step must produce identical results on a
1-device and an 8-device mesh (GSPMD gradient psum + cross-replica BN
must be exact up to float noise), and sharded BN must see the GLOBAL
batch statistics (sync-BN semantics, config/config.yaml:76).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from snn_for_object_detection_tpu.models import compile as C
from snn_for_object_detection_tpu.models import spec as S
from snn_for_object_detection_tpu.parallel import (
    batch_sharding,
    data_extent,
    feature_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from tests.test_detector import MicroSODa

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_train_step(model, optimizer, mesh, time_batched=False):
    rep = replicated(mesh)
    feat_sh = feature_sharding(mesh)
    fwd = model.forward_seq if time_batched else model.forward

    def train_step(params, opt_state, stats, X, labels):
        def loss_fn(p, stats):
            preds, new_stats, _ = fwd(p, stats, X, train=True)
            return model.loss(preds, labels), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, loss

    return jax.jit(
        train_step,
        in_shardings=(rep, rep, rep, feat_sh, batch_sharding(mesh, 0)),
        out_shardings=(rep, rep, rep, rep),
    )


def test_sharded_train_step_matches_single_device(rng):
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    optimizer = optax.adamax(1e-3)
    params, stats = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)

    T, B = 4, 8
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        step = make_train_step(model, optimizer, mesh)
        Xd, labd = shard_batch(mesh, X, labels)
        p, o, s, loss = step(params, opt_state, stats, Xd, labd)
        results[n_dev] = (jax.device_get(p), float(loss))

    p1, l1 = results[1]
    p8, l8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_spatial_sharded_train_step_matches_single_device(rng):
    """2-D (data x space) mesh: with B=2 — smaller than the 8 devices,
    the 1Mpx-training geometry — the height axis shards over ``space``
    and the train step must still be exact vs one device (GSPMD halo
    exchange at conv shard edges + cross-shard BN spatial mean)."""
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    optimizer = optax.adamax(1e-3)
    params, stats = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)

    T, B = 4, 2
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]

    results = {}
    for name, mesh in (
        ("single", make_mesh(jax.devices()[:1])),
        ("dp2_sp4", make_mesh(jax.devices()[:8], spatial=4)),
    ):
        step = make_train_step(model, optimizer, mesh)
        Xd, labd = shard_batch(mesh, X, labels)
        p, o, s, loss = step(params, opt_state, stats, Xd, labd)
        results[name] = (jax.device_get(p), float(loss))

    assert data_extent(make_mesh(jax.devices()[:8], spatial=4)) == 2
    p1, l1 = results["single"]
    p8, l8 = results["dp2_sp4"]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_spatial_sharded_time_batched_train_step(rng):
    """The time-batched training schedule (forward_seq: folded convs +
    partitioned Pallas temporal cells + segment remat) on the same
    (data=2 x space=4) mesh — the 1Mpx multi-chip training config —
    must match one device. Compared at the LOSS + GRADIENT level: the
    folded convs reduce dL/dw over T*B*H*W in one pass, so shard
    partial-sum ordering perturbs near-zero gradient elements at fp32
    epsilon — enough to flip Adamax's step-0 sign update, which is why
    this test (unlike its step-scan sibling) does not compare params
    after an optimizer step."""
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))

    T, B = 4, 2
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels_j = jnp.asarray(labels)

    def loss_fn(p, stats, X):
        preds, new_stats, _ = model.forward_seq(p, stats, X, train=True)
        return model.loss(preds, labels_j), new_stats

    results = {}
    for name, mesh in (
        ("single", make_mesh(jax.devices()[:1])),
        ("dp2_sp4", make_mesh(jax.devices()[:8], spatial=4)),
    ):
        rep = replicated(mesh)
        step = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True),
            in_shardings=(rep, rep, feature_sharding(mesh)),
            out_shardings=((rep, rep), rep),
        )
        Xd, _ = shard_batch(mesh, X, labels)
        (loss, _), grads = step(params, stats, Xd)
        results[name] = (jax.device_get(grads), float(loss))

    g1, l1 = results["single"]
    g8, l8 = results["dp2_sp4"]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)


def test_spatial_sharded_hybrid_train_step(rng):
    """The hybrid schedule (time-batched backbone + per-step neck/heads,
    ``Trainer(time_batched="hybrid")``) on the (data=2 x space=4) mesh
    must match one device at the loss + gradient level (same tolerance
    rationale as the forward_seq sibling above)."""
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(0))

    T, B = 4, 2
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)
    labels = np.full((B, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    labels_j = jnp.asarray(labels)

    def loss_fn(p, stats, X):
        preds, new_stats, _ = model.forward_hybrid(p, stats, X, train=True)
        return model.loss(preds, labels_j), new_stats

    results = {}
    for name, mesh in (
        ("single", make_mesh(jax.devices()[:1])),
        ("dp2_sp4", make_mesh(jax.devices()[:8], spatial=4)),
    ):
        rep = replicated(mesh)
        step = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True),
            in_shardings=(rep, rep, feature_sharding(mesh)),
            out_shardings=((rep, rep), rep),
        )
        Xd, _ = shard_batch(mesh, X, labels)
        (loss, _), grads = step(params, stats, Xd)
        results[name] = (jax.device_get(grads), float(loss))

    g1, l1 = results["single"]
    g8, l8 = results["dp2_sp4"]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)


def test_trainer_spatial_mesh_geometry():
    """Trainer(spatial_devices=4) sizes a (data x space) mesh from the
    batch, and live reshape preserves the space extent."""
    from snn_for_object_detection_tpu.train import Trainer

    tr = Trainer(spatial_devices=4, out_dir="/tmp/_spatial_geom")
    mesh = tr.mesh_for_batch(2)
    assert dict(mesh.shape) == {"data": 2, "space": 4}

    tr.request_mesh_reshape(num_devices=4)  # 1 data replica x 4 space
    assert dict(tr._pending_mesh.shape) == {"data": 1, "space": 4}
    with pytest.raises(ValueError, match="not divisible"):
        tr.request_mesh_reshape(num_devices=6)


def test_sharded_bn_sees_global_batch(rng):
    """With the batch sharded 8 ways, BN's batch mean must be the
    global mean (sync-BN), not a per-shard mean."""
    blk = C.compile_block([S.Norm()], 2, (4, 4))
    params = blk.init(jax.random.PRNGKey(0))
    stats = blk.init_stats()
    mesh = make_mesh(jax.devices()[:8])

    # Per-sample means differ wildly: shard-local BN would diverge.
    X = np.zeros((8, 4, 4, 2), np.float32)
    for b in range(8):
        X[b] = b * 10.0 + rng.normal(size=(4, 4, 2))

    rep = replicated(mesh)

    def apply(params, stats, x):
        ctx = C.Ctx(train=True)
        y, new_stats, _ = blk.apply(params, stats, blk.init_state(8), x, ctx)
        return y, new_stats

    jit_apply = jax.jit(
        apply, in_shardings=(rep, rep, batch_sharding(mesh, 0))
    )
    Xd = jax.device_put(X, batch_sharding(mesh, 0))
    y, new_stats = jit_apply(params, stats, Xd)

    global_mean = X.mean(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(new_stats["b0"]["l0"]["mean"]), 0.1 * global_mean,
        rtol=1e-4, atol=1e-5,
    )
    # Output normalized against the GLOBAL mean: overall mean ~ 0
    np.testing.assert_allclose(np.asarray(y).mean(), 0.0, atol=1e-4)


def test_eval_detections_identical_across_meshes(rng):
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    params, stats = model.init(jax.random.PRNGKey(1))
    T, B = 4, 8
    X = (rng.random((T, B, 32, 40, 2)) < 0.5).astype(np.float32)

    outs = []
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        rep = replicated(mesh)

        def eval_step(params, stats, X):
            preds, _, _ = model.forward(params, stats, X)
            return model.detect(preds, max_out=20)

        jit_eval = jax.jit(
            eval_step, in_shardings=(rep, rep, batch_sharding(mesh, 1))
        )
        Xd = jax.device_put(X, batch_sharding(mesh, 1))
        outs.append(jax.device_get(jit_eval(params, stats, Xd)))

    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)
