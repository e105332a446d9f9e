"""Trainer tests: checkpoint roundtrip, end-to-end fit on synthetic
data (CPU, 8 virtual devices), eval path with mAP, plotter rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset
from snn_for_object_detection_tpu.train import Trainer
from snn_for_object_detection_tpu.train.checkpoint import CheckpointManager
from snn_for_object_detection_tpu.utils import Plotter
from tests.test_detector import MicroSODa


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traindata"))
    return make_synthetic_dataset(root, records_per_split=2, duration_ms=1500)


def make_dm(root, batch_size=2):
    return PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=batch_size, num_workers=1,
        num_load_file=2, num_steps=6, time_step=16, time_shift=3,
        max_labels=8, seed=0,
    )


def test_checkpoint_topk_and_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=2, monitor="map")
    for step, metric in [(1, 0.1), (2, 0.5), (3, 0.3), (4, 0.05)]:
        mgr.save(step, {"w": jnp.full((3,), float(step))}, metric=metric)
    # top-2 by metric: steps 2 (0.5) and 3 (0.3)
    kept = sorted(mgr._index.keys())
    assert kept == ["step_000000002", "step_000000003"]
    best = mgr.best_path()
    restored = mgr.restore(best, target={"w": jnp.zeros(3)})
    np.testing.assert_allclose(np.asarray(restored["w"]), 2.0)
    # 'last' always restorable (even if pruned from top-k index)
    last = mgr.restore(target={"w": jnp.zeros(3)})
    np.testing.assert_allclose(np.asarray(last["w"]), 4.0)


def test_fit_one_epoch_and_resume(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=3)
    dm = make_dm(synth_root)
    trainer = Trainer(
        max_epochs=1, limit_train_batches=3, limit_val_batches=2,
        check_val_every_n_epoch=1, out_dir=str(tmp_path / "run"),
        log_every_n_steps=2, save_top_k=2, seed=0,
    )
    result = trainer.fit(model, dm)
    assert result["step"] == 3
    assert np.isfinite(result["best_metric"]) or result["best_metric"] == -np.inf
    # metrics were logged
    assert os.path.exists(os.path.join(trainer.out_dir, "metrics.jsonl"))
    # checkpoint exists and resume continues from it
    ckpt_last = os.path.join(trainer.out_dir, "checkpoints", "last")
    assert os.path.exists(ckpt_last)

    trainer2 = Trainer(
        max_epochs=2, limit_train_batches=3, limit_val_batches=2,
        check_val_every_n_epoch=5, out_dir=str(tmp_path / "run2"), seed=0,
    )
    result2 = trainer2.fit(model, dm, ckpt_path=ckpt_last)
    # resumed at step 3 / epoch 1; max_epochs=2 -> one more epoch of 3
    assert result2["step"] == 6
    assert result2["epoch"] == 2


def test_time_batched_trainer_matches_step_scan(synth_root, tmp_path):
    """Trainer(time_batched=True) — the forward_seq training schedule —
    must produce the same per-step losses as the default step scan
    (same seed, same data, same truncation draws)."""
    import json

    losses = {}
    val_losses = {}
    for name, tb in (("step", False), ("seq", True), ("hybrid", "hybrid")):
        model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=3)
        trainer = Trainer(
            max_epochs=1, limit_train_batches=3, check_val_every_n_epoch=1,
            limit_val_batches=1, out_dir=str(tmp_path / f"tb_{name}"),
            log_every_n_steps=1, seed=0, time_batched=tb,
        )
        trainer.fit(model, make_dm(synth_root))
        recs = [
            json.loads(l)
            for l in open(os.path.join(trainer.out_dir, "metrics.jsonl"))
        ]
        losses[name] = [r["train_loss"] for r in recs if "train_loss" in r]
        val_losses[name] = [r["val_loss"] for r in recs if "val_loss" in r]
    assert losses["step"], "no train losses logged"
    np.testing.assert_allclose(losses["seq"], losses["step"], rtol=1e-4)
    np.testing.assert_allclose(losses["hybrid"], losses["step"], rtol=1e-4)
    # eval follows the training schedule (loop.py eval_step uses the
    # same fwd); all three must report the same validation loss
    assert val_losses["step"], "no val losses logged"
    np.testing.assert_allclose(val_losses["seq"], val_losses["step"],
                               rtol=1e-4)
    np.testing.assert_allclose(val_losses["hybrid"], val_losses["step"],
                               rtol=1e-4)


def test_training_reduces_loss(synth_root, tmp_path):
    """Overfit smoke test: a few steps on the synthetic stream must
    reduce the training loss (SURVEY.md §4 test plan)."""
    model = MicroSODa(
        num_classes=2, in_hw=(240, 304), time_window=0, learning_rate=5e-3
    )
    dm = make_dm(synth_root)
    trainer = Trainer(
        max_epochs=4, limit_train_batches=4, check_val_every_n_epoch=100,
        out_dir=str(tmp_path / "overfit"), log_every_n_steps=100, seed=0,
    )
    result = trainer.fit(model, dm)
    import json

    losses = [
        json.loads(l)["epoch_train_loss"]
        for l in open(os.path.join(trainer.out_dir, "metrics.jsonl"))
        if "epoch_train_loss" in l
    ]
    assert len(losses) == 4
    assert losses[-1] < losses[0], losses


def test_eval_produces_map(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    trainer = Trainer(
        limit_val_batches=2, out_dir=str(tmp_path / "ev"), seed=0
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    metrics = trainer.validate(model, dm, params, stats)
    for k in ("val_loss", "map", "map_50", "mar_1", "mar_10", "mar_100"):
        assert k in metrics
        assert np.isfinite(metrics[k])


def test_plotter_renders_boxes():
    p = Plotter(threshold=0.5, save_video=False, show_video=False)
    p.labels = ["car", "person"]
    frame = np.zeros((40, 60, 2), np.float32)
    # event pixels chosen inside the boxes, away from drawn edges/text
    frame[22, 30, 1] = 1  # positive event
    frame[20, 30, 0] = 1  # negative event
    preds = np.array([[0, 0.9, 0.2, 0.2, 0.8, 0.8]])
    target = np.array([[1, 0.1, 0.1, 0.9, 0.9], [-1, -1, -1, -1, -1]])
    img = p.apply(frame, preds, target)
    assert img.shape == (40, 60, 3)
    assert img[22, 30, 2] == 255  # positive -> red
    assert img[20, 30, 0] == 255  # negative -> blue
    assert img.sum() > 2 * 255  # boxes drawn


def test_plotter_writes_video(tmp_path):
    p = Plotter(save_video=True, show_video=False, file_path=str(tmp_path))
    frames = [np.zeros((32, 48, 3), np.uint8) for _ in range(3)]
    p(frames, interval=16, batch_idx="7")
    assert os.path.exists(tmp_path / "out7.avi")
    assert os.path.getsize(tmp_path / "out7.avi") > 0


def test_predict_over_mt_windows(synth_root, tmp_path):
    """End-to-end MT path (weak-spot coverage): multi-target fixed
    windows (one_label=False, datasets.py:290-344) feed the streaming
    predict loop and render a video — the reference's use of the MT
    dataset (predict/visualization; its 6-column labels are untrainable
    by design, detector.loss rejects them)."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=1)
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=2, num_steps=4, time_step=16, one_label=False,
        max_labels=8, seed=0,
    )
    # MT windows really flow: 6-column window-relative labels
    X, labels = next(iter(dm.predict_loader()))
    assert X.shape[0] == 4 and labels.shape[-1] == 6
    params, stats = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(out_dir=str(tmp_path / "run"), seed=0,
                      limit_predict_batches=1)
    plotter = Plotter(save_video=True, show_video=False,
                      file_path=str(tmp_path / "vid"))
    trainer.predict(model, dm, params, stats, plotter)
    vids = [f for f in os.listdir(tmp_path / "vid") if f.endswith(".avi")]
    assert vids, "MT predict must write a video"


def test_predict_slices_mt_labels_for_plotter(synth_root, tmp_path):
    """Trainer.predict must hand the plotter (class, x1..y2) GT rows:
    6-column MT labels are sliced past the frame index. Deliberate
    divergence from the reference bug (soda.py:199 feeds 6-col labels
    to a 5-col plotter API, silently drawing wrong GT boxes)."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=1)
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=1, num_workers=1,
        num_load_file=2, num_steps=3, time_step=16, one_label=False,
        max_labels=8, seed=0,
    )
    raw = next(iter(dm.predict_loader()))[1][0]  # [N, 6] MT labels
    seen = []
    plotter = Plotter(save_video=False, show_video=False)
    orig_apply = plotter.apply

    def capture(frame, preds, target):
        seen.append(None if target is None else np.asarray(target))
        return orig_apply(frame, preds, target)

    plotter.apply = capture
    params, stats = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(out_dir=str(tmp_path / "run"), seed=0,
                      limit_predict_batches=1)
    trainer.predict(model, dm, params, stats, plotter)
    targets = [t for t in seen if t is not None]
    assert targets, "final frame must render GT"
    assert targets[-1].shape[1] == 5  # (class, x1..y2), frame idx gone
    np.testing.assert_allclose(targets[-1], np.asarray(raw)[:, 1:])


def test_fit_auto_resume(synth_root, tmp_path):
    """ckpt_path='auto' resumes from the run's own last checkpoint."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    out = str(tmp_path / "auto")
    t1 = Trainer(max_epochs=1, limit_train_batches=2, limit_val_batches=1,
                 check_val_every_n_epoch=1, out_dir=out, seed=0)
    t1.fit(model, dm, ckpt_path="auto")  # fresh start (no ckpt yet)
    t2 = Trainer(max_epochs=2, limit_train_batches=2, limit_val_batches=1,
                 check_val_every_n_epoch=5, out_dir=out, seed=0)
    result = t2.fit(model, dm, ckpt_path="auto")
    assert result["step"] == 4  # 2 from run 1 + 2 more
    assert result["epoch"] == 2


def test_profile_hook_writes_trace(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    prof = str(tmp_path / "prof")
    trainer = Trainer(max_epochs=1, limit_train_batches=6,
                      check_val_every_n_epoch=100,
                      out_dir=str(tmp_path / "run"), profile_dir=prof, seed=0)
    trainer.fit(model, dm)
    import glob as g
    assert g.glob(os.path.join(prof, "**", "*.trace.json.gz"),
                  recursive=True) or g.glob(
        os.path.join(prof, "**", "*.xplane.pb"), recursive=True)


def test_gradient_clipping(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    trainer = Trainer(max_epochs=1, limit_train_batches=2,
                      check_val_every_n_epoch=100,
                      out_dir=str(tmp_path / "clip"),
                      gradient_clip_norm=1.0, seed=0)
    result = trainer.fit(model, dm)
    assert result["step"] == 2


def test_fast_dev_run(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    trainer = Trainer(out_dir=str(tmp_path / "fdr"), fast_dev_run=True, seed=0)
    result = trainer.fit(model, make_dm(synth_root))
    assert result["step"] == 1
    assert result["epoch"] == 1


def test_accumulate_grad_batches(synth_root, tmp_path):
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    trainer = Trainer(
        max_epochs=1, limit_train_batches=4, check_val_every_n_epoch=100,
        out_dir=str(tmp_path / "acc"), accumulate_grad_batches=2, seed=0,
    )
    result = trainer.fit(model, make_dm(synth_root))
    assert result["step"] == 4  # 4 micro-steps = 2 optimizer updates


def test_early_stopping_counts_checks(synth_root, tmp_path):
    """patience counts stagnant VALIDATION CHECKS (Lightning semantics),
    not epochs (regression: patience=3 with check_every=2 must allow 3
    stagnant checks = 6 epochs, not stop after 2 checks)."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    trainer = Trainer(
        max_epochs=10, limit_train_batches=1, limit_val_batches=1,
        check_val_every_n_epoch=2, early_stopping_patience=3,
        min_epochs=0, out_dir=str(tmp_path / "es"), seed=0,
    )
    result = trainer.fit(model, dm)
    # an untrained model: map stays 0 -> first check sets best, 3 more
    # stagnant checks trigger the stop at epoch 8 (checks at 2,4,6,8)
    assert result["epoch"] == 8


def test_resume_across_device_counts(synth_root, tmp_path):
    """Elastic data-parallel recovery: a checkpoint written while
    training on an 8-device mesh restores and continues on a 2-device
    mesh (device-loss scenario: supervise.py relaunches with fewer
    chips and a smaller batch; params/opt_state are replicated so the
    topology change is transparent)."""
    out = str(tmp_path / "elastic")
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    t1 = Trainer(max_epochs=1, limit_train_batches=2, limit_val_batches=1,
                 check_val_every_n_epoch=1, out_dir=out, seed=0)
    r1 = t1.fit(model, make_dm(synth_root, batch_size=8))  # 8-dev mesh
    assert t1.mesh.devices.size == 8
    t2 = Trainer(max_epochs=2, limit_train_batches=2, limit_val_batches=1,
                 check_val_every_n_epoch=5, out_dir=out, seed=0)
    r2 = t2.fit(model, make_dm(synth_root, batch_size=2), ckpt_path="auto")
    assert t2.mesh.devices.size == 2
    assert r2["step"] == r1["step"] + 2
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(r2["params"])[0])
    ).all()


def test_live_mesh_reshape(synth_root, tmp_path):
    """Live data-parallel mesh reshape WITHOUT checkpoint + relaunch
    (ROADMAP): queue 8 -> 4 devices before fit; the trainer re-places
    params/opt state and rebuilds its jitted steps at the first epoch
    boundary, and training continues on the smaller mesh in-process."""
    out = str(tmp_path / "live_reshape")
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    trainer = Trainer(max_epochs=2, limit_train_batches=2,
                      limit_val_batches=1, check_val_every_n_epoch=5,
                      out_dir=out, seed=0)
    trainer.request_mesh_reshape(num_devices=4)
    result = trainer.fit(model, make_dm(synth_root, batch_size=8))
    assert trainer.mesh.devices.size == 4  # applied after epoch 1
    assert result["step"] == 4  # both epochs ran, no restart
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(result["params"])[0])
    ).all()


def test_live_mesh_reshape_file_trigger(synth_root, tmp_path):
    """External supervisors trigger the same reshape by writing the
    target device count to out_dir/reshape_request; an indivisible
    count is ignored with a warning and the file is consumed."""
    out = str(tmp_path / "file_reshape")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "reshape_request"), "w") as f:
        f.write("2")
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    trainer = Trainer(max_epochs=2, limit_train_batches=1,
                      limit_val_batches=1, check_val_every_n_epoch=5,
                      out_dir=out, seed=0)
    result = trainer.fit(model, make_dm(synth_root, batch_size=4))
    assert trainer.mesh.devices.size == 2
    assert not os.path.exists(os.path.join(out, "reshape_request"))
    assert result["step"] == 2

    # indivisible request: ignored, training unaffected
    with open(os.path.join(out, "reshape_request"), "w") as f:
        f.write("3")
    trainer2 = Trainer(max_epochs=1, limit_train_batches=1,
                       limit_val_batches=1, check_val_every_n_epoch=5,
                       out_dir=out, seed=0)
    trainer2.fit(model, make_dm(synth_root, batch_size=4))
    assert trainer2.mesh.devices.size in (4, 8)  # unchanged by bad req
    assert not os.path.exists(os.path.join(out, "reshape_request"))


def test_optimizer_and_lr_schedule_options(synth_root, tmp_path):
    """Trainer optimizer/lr_schedule config surface (beyond the
    reference's fixed Adamax): named optax factories and warmup-cosine
    schedules train; bad names raise clearly."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    dm = make_dm(synth_root)
    trainer = Trainer(
        max_epochs=1, limit_train_batches=2, check_val_every_n_epoch=100,
        out_dir=str(tmp_path / "opt"), seed=0,
        optimizer={"name": "adamw", "weight_decay": 1e-4},
        lr_schedule={"name": "warmup_cosine", "warmup_steps": 1,
                     "decay_steps": 10},
    )
    result = trainer.fit(model, dm)
    assert result["step"] == 2
    leaves = jax.tree_util.tree_leaves(result["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    with pytest.raises(ValueError, match="unknown optimizer"):
        Trainer(out_dir=str(tmp_path / "bad"), optimizer="not_an_opt",
                )._make_optimizer(model)
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        Trainer(out_dir=str(tmp_path / "bad2"),
                lr_schedule={"name": "bogus"})._make_learning_rate(model)


def test_auto_schedule_resolves_and_fits(synth_root, tmp_path):
    """Trainer(time_batched="auto") times the three equivalent
    schedules on the real batch geometry at fit start, pins the
    fastest, and trains normally with it."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=2)
    dm = make_dm(synth_root)
    trainer = Trainer(
        max_epochs=1, limit_train_batches=2, limit_val_batches=1,
        check_val_every_n_epoch=1, out_dir=str(tmp_path / "auto"),
        prefetch_batches=0, seed=0, time_batched="auto",
    )
    result = trainer.fit(model, dm)
    assert trainer.time_batched == "auto"  # the setting survives
    assert trainer._auto_schedule["train"] in (False, True, "hybrid")
    assert result["step"] == 2
    assert np.isfinite(float(result["best_metric"])) or \
        result["best_metric"] == -np.inf


def test_auto_schedule_rejects_bad_value():
    with pytest.raises(ValueError, match="time_batched"):
        Trainer(time_batched="sometimes")


def test_auto_schedule_merges_host_timings(monkeypatch, synth_root, tmp_path):
    """Multi-host 'auto' must pin the SAME schedule on every host —
    diverged compiled programs hang collectives — so per-host timings
    are summed via allgather before the argmin. Fake a second host
    whose timings overwhelmingly favor 'hybrid' and check it wins."""
    from snn_for_object_detection_tpu.parallel import distributed as dist_mod

    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=2)
    dm = make_dm(synth_root)
    trainer = Trainer(
        out_dir=str(tmp_path / "merge"), seed=0, time_batched="auto",
    )
    trainer.mesh_for_batch(dm.batch_size)  # as fit/validate do first

    monkeypatch.setattr(dist_mod, "is_distributed", lambda: True)

    def fake_allgather(local):
        if isinstance(local, bool):  # per-candidate compile barrier
            return [local, True]
        other = {k: (1e-6 if k == "hybrid" else 1e9) for k in local}
        return [local, other]

    monkeypatch.setattr(dist_mod, "allgather_pickle", fake_allgather)
    assert trainer._schedule_for(model, dm, train=False) == "hybrid"


def test_ema_weight_averaging(synth_root, tmp_path):
    """Trainer(ema_decay=...): the averaged tree obeys the closed-form
    endpoints — decay=1 freezes it at the init params, decay=0 tracks
    the live params exactly — and it round-trips through checkpoints."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)

    def fit(decay, out):
        trainer = Trainer(
            max_epochs=1, limit_train_batches=2, limit_val_batches=1,
            check_val_every_n_epoch=1, out_dir=str(tmp_path / out),
            prefetch_batches=0, seed=0, ema_decay=decay,
        )
        return trainer, trainer.fit(model, make_dm(synth_root))

    # decay=1: the average never moves off the init point
    _, res1 = fit(1.0, "ema1")
    init_params, _ = model.init(
        jax.random.fold_in(jax.random.PRNGKey(0), 0)
    )
    for a, b in zip(
        jax.tree.leaves(res1["ema_params"]), jax.tree.leaves(init_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... and training itself still moved the live params
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(res1["params"]), jax.tree.leaves(init_params)
        )
    )
    assert moved

    # decay=0: the average IS the live params
    _, res0 = fit(0.0, "ema0")
    for a, b in zip(
        jax.tree.leaves(res0["ema_params"]), jax.tree.leaves(res0["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # checkpoint roundtrip: resume restores the average and keeps going
    trainer3, res3 = fit(0.9, "ema_ck")
    trainer4 = Trainer(
        max_epochs=2, limit_train_batches=2, limit_val_batches=1,
        check_val_every_n_epoch=2, out_dir=str(tmp_path / "ema_ck"),
        prefetch_batches=0, seed=0, ema_decay=0.9,
    )
    res4 = trainer4.fit(model, make_dm(synth_root), ckpt_path="auto")
    assert res4["step"] == 4 and "ema_params" in res4
    # the resumed average moved on from the saved one
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(res4["ema_params"]),
            jax.tree.leaves(res3["ema_params"]),
        )
    )


def test_ema_decay_validation():
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(ema_decay=1.5)


def test_ema_accumulation_gating(tmp_path):
    """Under gradient accumulation the EMA must blend ONLY when
    MultiSteps flushes a real optimizer step — otherwise decay
    compounds to decay^k per true update. On a micro step the average
    (and the params) stay bit-identical; on the flush step both move,
    and the average equals the closed-form blend."""
    import jax.numpy as jnp

    from snn_for_object_detection_tpu.parallel import shard_batch

    trainer = Trainer(
        ema_decay=0.5, accumulate_grad_batches=2,
        out_dir=str(tmp_path / "gate"), seed=0,
    )
    trainer.mesh_for_batch(2)
    model = MicroSODa(num_classes=2, in_hw=(32, 40), time_window=0)
    optimizer, jit_train, _ = trainer._build_steps(model, False)

    params, stats = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    ema = jax.tree.map(jnp.array, params)
    p0 = jax.device_get(params)
    e0 = jax.device_get(ema)

    rng = np.random.default_rng(0)
    X = jnp.asarray((rng.random((3, 2, 32, 40, 2)) < 0.5), jnp.float32)
    labels = np.full((2, 2, 5), -1.0, np.float32)
    labels[:, 0] = [0, 0.2, 0.2, 0.6, 0.6]
    Xd, labd = shard_batch(trainer.mesh, X, jnp.asarray(labels))

    key = jax.random.PRNGKey(1)
    # micro step 1/2: no flush -> neither params nor the average move
    params, opt_state, stats, ema, _ = jit_train(
        params, opt_state, stats, ema, Xd, labd, key
    )
    p1, e1 = jax.device_get(params), jax.device_get(ema)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(e1), jax.tree.leaves(e0)):
        np.testing.assert_array_equal(a, b)

    # micro step 2/2: flush -> params move, average = 0.5*old + 0.5*new
    params, opt_state, stats, ema, _ = jit_train(
        params, opt_state, stats, ema, Xd, labd, key
    )
    p2, e2 = jax.device_get(params), jax.device_get(ema)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p0))
    )
    for e, eo, p in zip(
        jax.tree.leaves(e2), jax.tree.leaves(e0), jax.tree.leaves(p2)
    ):
        np.testing.assert_allclose(e, 0.5 * eo + 0.5 * p, rtol=1e-6)


def test_checkpoint_stores_post_comparison_early_stopping_state(
    synth_root, tmp_path
):
    """The checkpoint written at a validation must already contain THAT
    validation's outcome (best_metric / checks_since_best) — saving the
    pre-comparison values forgot a new best across every restart."""
    model = MicroSODa(num_classes=2, in_hw=(240, 304), time_window=0)
    trainer = Trainer(
        max_epochs=1, limit_train_batches=1, limit_val_batches=1,
        check_val_every_n_epoch=1, out_dir=str(tmp_path / "es"),
        prefetch_batches=0, seed=0,
    )
    res = trainer.fit(model, make_dm(synth_root))
    restored = trainer.ckpt.restore(
        os.path.join(trainer.out_dir, "checkpoints", "last"),
        target={"best_metric": 0.0, "checks_since_best": 0},
    )
    # the run's single validation set best_metric; the stored value
    # must match the post-comparison result the fit returned
    assert float(restored["best_metric"]) == float(res["best_metric"])
    assert int(restored["checks_since_best"]) == 0
