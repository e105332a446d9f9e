"""Event-stream augmentation: geometric correctness, determinism, and
loader wiring (train split only)."""

import numpy as np
import pytest

from snn_for_object_detection_tpu.data import PropheseeDataModule
from snn_for_object_detection_tpu.data.augment import Augmenter, make_augmenter
from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset


def _sample(w=8, h=6, t=3):
    feats = np.zeros((t, h, w, 2), np.uint8)
    feats[1, 2, 1, 0] = 1  # one OFF event at x=1
    feats[2, 3, 5, 1] = 2  # two ON events at x=5
    labels = np.array([[0, 0.1, 0.2, 0.4, 0.8]], np.float32)
    return feats, labels


def test_hflip_mirrors_events_and_boxes():
    feats, labels = _sample()
    aug = Augmenter(hflip=1.0)
    f2, l2 = aug(feats, labels, np.random.default_rng(0))
    # event at x=1 lands at x=W-2, channel preserved
    assert f2[1, 2, 6, 0] == 1 and f2[2, 3, 2, 1] == 2
    np.testing.assert_allclose(l2[0], [0, 0.6, 0.2, 0.9, 0.8], atol=1e-6)
    assert (l2[:, 1] < l2[:, 3]).all()  # x1 < x2 preserved
    # flip twice = identity
    f3, l3 = aug(f2, l2, np.random.default_rng(0))
    np.testing.assert_array_equal(f3, feats)
    np.testing.assert_allclose(l3, labels, atol=1e-6)


def test_polarity_swap_exchanges_channels():
    feats, labels = _sample()
    f2, l2 = Augmenter(polarity_swap=1.0)(
        feats, labels, np.random.default_rng(0)
    )
    assert f2[1, 2, 1, 1] == 1 and f2[2, 3, 5, 0] == 2
    np.testing.assert_array_equal(l2, labels)  # boxes untouched


def test_pixel_dropout_extremes():
    feats, labels = _sample()
    f_all, _ = Augmenter(pixel_dropout=1.0)(
        feats, labels, np.random.default_rng(0)
    )
    assert f_all.sum() == 0
    f_none, _ = Augmenter(pixel_dropout=0.0)(
        feats, labels, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(f_none, feats)


def test_make_augmenter_config_forms():
    assert make_augmenter(None) is None
    assert make_augmenter(False) is None
    assert make_augmenter(True).hflip == 0.5
    a = make_augmenter({"hflip": 0.3, "pixel_dropout": 0.1})
    assert a.hflip == 0.3 and a.pixel_dropout == 0.1
    with pytest.raises(TypeError):
        make_augmenter({"bogus_field": 1})


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("augdata"))
    return make_synthetic_dataset(root, records_per_split=1,
                                  duration_ms=1200)


def _first_batch(root, augment):
    dm = PropheseeDataModule(
        data_dir=root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=1, num_steps=6, time_step=16, time_shift=3,
        max_labels=8, seed=123, augment=augment,
    )
    it = dm.train_loader()
    batch = next(it)
    it.close()
    return batch


def test_loader_applies_hflip_on_train_split(synth_root):
    (x0, l0) = _first_batch(synth_root, None)
    (x1, l1) = _first_batch(synth_root, {"hflip": 1.0})
    # same single-worker deterministic stream, mirrored width
    np.testing.assert_array_equal(x1, x0[:, :, :, ::-1, :])
    real = l0[0, :, 0] >= 0
    np.testing.assert_allclose(
        l1[0, real, 1], 1.0 - l0[0, real, 3], atol=1e-6
    )
    # padding rows untouched
    np.testing.assert_array_equal(l1[0, ~real], l0[0, ~real])


def test_loader_no_augment_on_eval_splits(synth_root):
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=1, num_steps=6, time_step=16, time_shift=3,
        max_labels=8, seed=123, augment={"hflip": 1.0},
    )
    dm_plain = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=1, num_steps=6, time_step=16, time_shift=3,
        max_labels=8, seed=123,
    )
    it_a, it_b = dm.val_loader(), dm_plain.val_loader()
    (xa, la), (xb, lb) = next(it_a), next(it_b)
    it_a.close()
    it_b.close()
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(la, lb)
