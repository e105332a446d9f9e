"""Tracker logging backends (trainer.logger config surface,
reference main.py:13-16 + gitignored Neptune logger.yaml)."""

import glob
import os

import pytest

from snn_for_object_detection_tpu.train.loggers import CSVLogger, TensorBoardLogger
from snn_for_object_detection_tpu.train.loop import MetricsLogger, Trainer


def test_csv_logger_accumulates_union_schema(tmp_path):
    lg = CSVLogger()
    lg.set_out_dir(str(tmp_path))
    lg.log_metrics(1, {"train_loss": 0.5})
    lg.log_metrics(2, {"train_loss": 0.4, "map": 0.1})
    lg.close()
    with open(tmp_path / "metrics.csv") as f:
        lines = f.read().splitlines()
    assert lines[0] == "step,train_loss,map"
    assert lines[1].startswith("1,0.5")
    assert lines[2] == "2,0.4,0.1"


def test_tensorboard_logger_writes_event_file(tmp_path):
    pytest.importorskip("tensorboardX")
    lg = TensorBoardLogger()
    lg.set_out_dir(str(tmp_path))
    lg.log_metrics(1, {"train_loss": 0.5, "note": "skipped-non-scalar"})
    lg.close()
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events

    # the scalar round-trips through the event file (TFRecord framing:
    # u64 length, u32 len-crc, payload, u32 payload-crc)
    import struct

    from tensorboardX.proto import event_pb2

    found = []
    with open(events[0], "rb") as f:
        blob = f.read()
    off = 0
    while off + 12 <= len(blob):
        (length,) = struct.unpack_from("<Q", blob, off)
        payload = blob[off + 12 : off + 12 + length]
        ev = event_pb2.Event()
        ev.ParseFromString(payload)
        for v in ev.summary.value:
            found.append((v.tag, v.simple_value))
        off += 12 + length + 4
    assert ("train_loss", 0.5) in found


def test_metrics_logger_fans_out_to_backends(tmp_path):
    class Spy:
        def __init__(self):
            self.calls = []

        def log_metrics(self, step, payload):
            self.calls.append((step, dict(payload)))

        def close(self):
            self.closed = True

    spy = Spy()
    ml = MetricsLogger(str(tmp_path), backends=[spy])
    ml.log(3, {"train_loss": 1.0})
    ml.close()
    assert spy.calls == [(3, {"train_loss": 1.0})]
    assert spy.closed


def test_trainer_instantiates_logger_from_config(tmp_path):
    trainer = Trainer(
        out_dir=str(tmp_path),
        logger={
            "class_path":
                "snn_for_object_detection_tpu.train.CSVLogger",
            "init_args": {"filename": "m.csv"},
        },
    )
    trainer.logger.log(1, {"train_loss": 2.0})
    assert os.path.exists(tmp_path / "m.csv")
    # a list of backends also works
    t2 = Trainer(
        out_dir=str(tmp_path / "two"),
        logger=[
            {"class_path": "snn_for_object_detection_tpu.train.CSVLogger"},
            {"class_path":
                 "snn_for_object_detection_tpu.train.TensorBoardLogger"},
        ],
    )
    assert len(t2.logger.backends) == 2
