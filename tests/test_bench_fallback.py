"""Outage resilience of the driver bench (bench.py).

Round 3's driver bench was zeroed by a TPU-tunnel outage
(BENCH_r03.json rc=1, no number). bench.py now replays the most recent
chip-measured result — clearly marked stale — when the backend never
comes up, instead of dying unparseable. These tests pin that contract
without needing a device.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_replay_emits_marked_stale_json(capsys, tmp_path):
    bench = _load_bench()
    rec = {
        "metric": "gen1_event_frames_per_sec_per_chip_T32",
        "value": 1234.5,
        "unit": "event-frames/s",
        "vs_baseline": 2.0,
        "measured_at": "2026-08-17T07:13:33Z",
    }
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps(rec))
    bench.LAST_GOOD_PATH = str(p)

    assert bench._replay_last_good("tunnel outage") is True
    out = capsys.readouterr().out.strip().splitlines()
    parsed = json.loads(out[-1])  # driver contract: last line is the JSON
    assert parsed["value"] == 1234.5
    assert parsed["stale"] is True
    assert "tunnel outage" in parsed["stale_reason"]
    assert "2026-08-17" in parsed["stale_reason"]


def test_replay_returns_false_without_cache(tmp_path):
    bench = _load_bench()
    bench.LAST_GOOD_PATH = str(tmp_path / "missing.json")
    assert bench._replay_last_good("x") is False


def test_committed_last_good_is_driver_parseable():
    """The seeded cache itself must satisfy the driver's JSON contract."""
    with open(os.path.join(REPO, "BENCH_LAST_GOOD.json")) as f:
        rec = json.load(f)
    assert rec["metric"] == "gen1_event_frames_per_sec_per_chip_T32"
    assert isinstance(rec["value"], (int, float)) and rec["value"] > 0
    assert rec["unit"] == "event-frames/s"
    assert "measured_at" in rec


def test_record_last_good_skips_cpu_backend(tmp_path, monkeypatch):
    """Only real-device numbers are worth replaying in an outage."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench = _load_bench()
    bench.LAST_GOOD_PATH = str(tmp_path / "lg.json")
    bench._record_last_good({"value": 1.0})
    assert not os.path.exists(bench.LAST_GOOD_PATH)
