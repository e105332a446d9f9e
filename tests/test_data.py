"""Data pipeline tests: .dat codec golden files, rasterizer, streams."""

import numpy as np
import pytest

from snn_for_object_detection_tpu.data import (
    EventReader,
    MTStream,
    PropheseeDataModule,
    STStream,
    write_dat,
)
from snn_for_object_detection_tpu.data.rasterize import rasterize
from snn_for_object_detection_tpu.data.synthetic import (
    generate_recording,
    make_synthetic_dataset,
)


def test_dat_roundtrip(tmp_path):
    t = np.array([100, 5000, 5001, 9_000_000], np.uint32)
    x = np.array([0, 303, 17, 2**14 - 1], np.uint16)
    y = np.array([0, 239, 100, 2**14 - 1], np.uint16)
    p = np.array([0, 1, 1, 0], np.uint8)
    path = str(tmp_path / "ev_td.dat")
    write_dat(path, t, x, y, p)
    r = EventReader(path)
    assert r.n_events == 4
    ev = r.load_delta_t(10_000_000)
    np.testing.assert_array_equal(ev["t"], t)
    np.testing.assert_array_equal(ev["x"], x)
    np.testing.assert_array_equal(ev["y"], y)
    np.testing.assert_array_equal(ev["p"], p)
    assert r.done


def test_dat_golden_bytes(tmp_path):
    """The packed word layout must match the Prophesee spec
    (SURVEY.md §2.6): x bits 0-13, y bits 14-27, p bit 28."""
    path = str(tmp_path / "g_td.dat")
    write_dat(path, np.array([7]), np.array([5]), np.array([3]), np.array([1]))
    raw = open(path, "rb").read()
    # strip header lines
    body = raw
    while body.startswith(b"%"):
        body = body[body.index(b"\n") + 1 :]
    body = body[2:]  # ev type + size
    ts, word = np.frombuffer(body, "<u4")
    assert ts == 7
    assert word == (5 | (3 << 14) | (1 << 28))


def test_event_reader_delta_t_windows(tmp_path):
    t = np.arange(0, 100_000, 1000, dtype=np.uint32)  # 100 events, 1ms apart
    n = len(t)
    path = str(tmp_path / "w_td.dat")
    write_dat(path, t, np.zeros(n, np.uint16), np.zeros(n, np.uint16),
              np.zeros(n, np.uint8))
    r = EventReader(path)
    ev1 = r.load_delta_t(16_000)  # [0, 16000) -> 16 events
    assert len(ev1["t"]) == 16
    assert r.current_time == 16_000
    ev2 = r.load_delta_t(16_000)
    assert len(ev2["t"]) == 16
    assert ev2["t"][0] == 16_000
    r.reset()
    assert r.current_time == 0 and not r.done


def test_rasterize_scatter():
    events = {
        "x": np.array([1, 2, 1], np.uint16),
        "y": np.array([0, 1, 0], np.uint16),
        "p": np.array([0, 1, 0], np.uint8),
    }
    time_idx = np.array([0, 1, 1])
    f = rasterize(events, time_idx, 2, 3, 4)
    assert f.shape == (2, 3, 4, 2)
    assert f[0, 0, 1, 0] == 1
    assert f[1, 1, 2, 1] == 1
    assert f[1, 0, 1, 0] == 1
    assert f.sum() == 3


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdata"))
    return make_synthetic_dataset(root, records_per_split=2, duration_ms=1500)


def test_st_stream_yields_training_samples(synth_root):
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=2, num_steps=8, time_step=16, time_shift=4,
    )
    stream = dm._make_stream("train", 0, 1)
    assert isinstance(stream, STStream)
    it = iter(stream)
    for _ in range(3):
        features, labels = next(it)
        assert features.shape == (8, 240, 304, 2)
        assert features.dtype == np.uint8  # compact transfer dtype
        assert set(np.unique(features)) <= {0, 1}
        assert labels.shape[1] == 5
        assert len(labels) >= 1
        # boxes normalized
        assert labels[:, 1:].min() >= 0.0 and labels[:, 1:].max() <= 1.0


def test_mt_stream_yields_windows(synth_root):
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=1,
        num_load_file=2, num_steps=8, time_step=16, one_label=False,
    )
    stream = dm._make_stream("train", 0, 1)
    assert isinstance(stream, MTStream)
    it = iter(stream)
    features, labels = next(it)
    assert features.shape == (8, 240, 304, 2)
    assert labels.shape[1] == 6  # (frame_idx, class, xyxy)
    if len(labels):
        assert labels[:, 0].min() >= 0 and labels[:, 0].max() < 8


def test_loader_batches(synth_root):
    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=3, num_workers=2,
        num_load_file=2, num_steps=6, time_step=16, time_shift=4,
        max_labels=16,
    )
    it = dm.train_loader()
    features, labels = next(it)
    assert features.shape == (6, 3, 240, 304, 2)
    assert labels.shape == (3, 16, 5)
    # padding rows are -1
    assert (labels[labels[:, :, 0] < 0] == -1).all()
    # at least one real label per sample (ST mode guarantees it)
    assert all((labels[b, :, 0] >= 0).sum() >= 1 for b in range(3))


def test_st_label_at_end_alignment(tmp_path):
    """The selected GT must land time_shift steps before the window end
    (datasets.py:409-415): window covers
    [label_time - (num_steps - shift) * step, label_time + shift * step)."""
    # One object, GT at exactly 160ms; events uniform and dense enough
    # to clear the 4000-events/frame acceptance threshold.
    n = 160_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.integers(0, 400_000, n)).astype(np.uint32)
    x = rng.integers(0, 304, n).astype(np.uint16)
    y = rng.integers(0, 240, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    d = tmp_path / "gen1" / "train"
    d.mkdir(parents=True)
    write_dat(str(d / "r_td.dat"), t, x, y, p)
    from snn_for_object_detection_tpu.data.synthetic import GT_DTYPE

    gt = np.array([(160_000, 50.0, 50.0, 100.0, 100.0, 1, 1.0, 0)], GT_DTYPE)
    np.save(str(d / "r_bbox.npy"), gt)

    dm = PropheseeDataModule(
        data_dir=str(tmp_path), dataset="gen1", num_workers=1,
        num_load_file=1, num_steps=8, time_step=16, time_shift=2,
    )
    stream = dm._make_stream("train", 0, 1)
    features, labels = next(iter(stream))
    assert labels.shape == (1, 5)
    assert labels[0, 0] == 1  # class id
    np.testing.assert_allclose(labels[0, 1], 50 / 304, rtol=1e-5)


def test_missing_dataset_raises(tmp_path):
    dm = PropheseeDataModule(data_dir=str(tmp_path), dataset="gen1")
    with pytest.raises(RuntimeError, match="does not contain data"):
        dm._files("train")


def test_bad_dataset_name():
    with pytest.raises(ValueError):
        PropheseeDataModule(dataset="nope")


def test_generate_recording_event_format():
    t, x, y, p, gt = generate_recording(duration_ms=200, seed=1)
    assert (np.diff(t.astype(np.int64)) >= 0).all()  # time-sorted
    assert x.max() < 304 and y.max() < 240
    assert set(np.unique(p)) <= {0, 1}
    assert len(gt) > 0
    assert gt["ts"].max() < 200_000


def test_loader_close_stops_workers(synth_root):
    import threading
    import time as _time

    dm = PropheseeDataModule(
        data_dir=synth_root, dataset="gen1", batch_size=2, num_workers=2,
        num_load_file=2, num_steps=6, time_step=16, time_shift=3,
    )
    before = threading.active_count()
    it = dm.train_loader()
    next(it)
    assert threading.active_count() > before
    it.close()
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() == before


def test_1mpx_pipeline(tmp_path):
    """High-res path: synthetic 1Mpx recording through the ST stream
    (7 classes, 1280x720, x-clip active; datasets.py:216-218,425-426)."""
    root = make_synthetic_dataset(
        str(tmp_path), dataset="1mpx", records_per_split=1, duration_ms=800,
        height=720, width=1280, num_classes=7, splits=("train",),
    )
    dm = PropheseeDataModule(
        data_dir=root, dataset="1mpx", batch_size=1, num_workers=1,
        num_load_file=1, num_steps=6, time_step=16, time_shift=3,
    )
    stream = dm._make_stream("train", 0, 1)
    assert stream.clip_x  # 1Mpx x-clip enabled
    features, labels = next(iter(stream))
    assert features.shape == (6, 720, 1280, 2)
    assert dm.get_labels()[0] == "pedestrians"
    assert labels[:, 0].max() < 7


def test_mt_fallback_clamps_trailing_events(tmp_path, monkeypatch):
    """Events after a non-step-aligned cursor can floor to
    time_idx == num_steps; the numpy fallback must drop them like the
    native kernel instead of crashing (regression)."""
    import snn_for_object_detection_tpu.data.prophesee as P

    # events start at 5000us (not step-aligned), run past the window
    t = np.arange(5_000, 700_000, 500, dtype=np.uint32)
    n = len(t)
    d = tmp_path / "gen1" / "train"
    d.mkdir(parents=True)
    write_dat(str(d / "m_td.dat"), t, np.zeros(n, np.uint16),
              np.zeros(n, np.uint16), np.zeros(n, np.uint8))
    from snn_for_object_detection_tpu.data.synthetic import GT_DTYPE

    np.save(str(d / "m_bbox.npy"),
            np.array([(100_000, 10, 10, 50, 50, 0, 1.0, 0)], GT_DTYPE))

    monkeypatch.setattr(P, "rasterize_records_native", lambda *a, **k: None)
    dm = PropheseeDataModule(
        data_dir=str(tmp_path), dataset="gen1", num_workers=1,
        num_load_file=1, num_steps=42, time_step=16, one_label=False,
    )
    stream = dm._make_stream("train", 0, 1)
    features, labels = next(iter(stream))  # must not raise IndexError
    assert features.shape[0] == 42


def test_polarity_masked_to_one_bit(tmp_path):
    """Records with spare bits 29-31 set must decode p to 0/1 on both
    paths (regression: numpy used & 0xF and crashed the rasterizer)."""
    path = str(tmp_path / "p_td.dat")
    # craft a raw record with p-field = 0b1011 (11)
    records = np.array([[100, 5 | (3 << 14) | (11 << 28)]], dtype="<u4")
    header = b"% synthetic\n"
    with open(path, "wb") as f:
        f.write(header)
        f.write(bytes([0x0C, 8]))
        f.write(records.tobytes())
    r = EventReader(path)
    ev = r.load_delta_t(1000)
    assert ev["p"][0] == 1  # 11 & 1

    from snn_for_object_detection_tpu.native import (
        decode_events_native, is_available,
    )
    if is_available():
        out = decode_events_native(records)
        assert out["p"][0] == 1
