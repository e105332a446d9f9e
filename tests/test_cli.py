"""CLI surface tests (in-process, CPU): fit -> test -> predict with a
small model over synthetic data, exercising main.py end-to-end."""

import os

import numpy as np
import pytest

import main as cli
from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clidata"))
    return make_synthetic_dataset(root, records_per_split=1, duration_ms=1200)


def common_args(synth_root, tmp_path, extra=()):
    return [
        "--config", "config/config.yaml",
        f"--data.init_args.data_dir={synth_root}",
        "--data.init_args.batch_size=2",
        "--data.init_args.num_steps=4",
        "--data.init_args.num_workers=1",
        "--data.init_args.num_load_file=1",
        "--data.init_args.time_shift=2",
        "--model.init_args.time_window=2",
        "--trainer.max_epochs=1",
        "--trainer.limit_train_batches=2",
        "--trainer.limit_val_batches=1",
        "--trainer.limit_test_batches=1",
        "--trainer.check_val_every_n_epoch=1",
        "--trainer.min_epochs=0",
        f"--trainer.out_dir={tmp_path}/run",
        *extra,
    ]


def test_cli_fit_then_test_then_predict(synth_root, tmp_path):
    cli.main(["fit", *common_args(synth_root, tmp_path)])
    ckpt = os.path.join(tmp_path, "run", "checkpoints", "last")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(tmp_path, "run", "config.yaml"))
    assert os.path.exists(os.path.join(tmp_path, "run", "metrics.jsonl"))

    cli.main(
        ["test", *common_args(synth_root, tmp_path),
         f"--ckpt_path={ckpt}"]
    )

    cli.main(
        ["validate", *common_args(synth_root, tmp_path),
         f"--ckpt_path={ckpt}"]
    )

    cli.main(
        ["predict", *common_args(synth_root, tmp_path),
         f"--ckpt_path={ckpt}",
         f"--plotter.init_args.file_path={tmp_path}/vid",
         "--plotter.init_args.show_video=false"]
    )
    vids = [f for f in os.listdir(tmp_path / "vid") if f.endswith(".avi")]
    assert vids, "predict must write a video"


def test_cli_rejects_bad_subcommand(synth_root, tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["explode"])


def test_loader_deterministic_with_single_worker(synth_root):
    def first_batch():
        dm = PropheseeDataModule(
            data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
            num_load_file=1, num_steps=6, time_step=16, time_shift=3,
            max_labels=8, seed=123,
        )
        it = dm.train_loader()
        batch = next(it)
        it.close()
        return batch

    (x1, l1), (x2, l2) = first_batch(), first_batch()
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(l1, l2)


def test_cli_geometry_mismatch_clear_error(synth_root, tmp_path):
    with pytest.raises(ValueError, match="dataset geometry"):
        cli.main([
            "fit", "--config", "config/config.yaml",
            f"--data.init_args.data_dir={synth_root}",
            "--model.init_args.in_hw=[64,80]",
            f"--trainer.out_dir={tmp_path}/run",
        ])
