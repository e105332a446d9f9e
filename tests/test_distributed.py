"""Multi-host integration: a real 2-process jax.distributed run on CPU.

Two subprocesses each own 2 virtual devices (global mesh = 4), read
disjoint dataset shards (host_id auto-derived by the Trainer), train in
lockstep on globally-sharded batches, and fold their per-host mAP
accumulators — the TPU-native version of the reference's
Lightning-DDP multi-node path (/root/reference/config/config.yaml:35-37).
"""

import json
import os
import subprocess
import sys

import pytest

from snn_for_object_detection_tpu.data.synthetic import make_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def test_two_process_fit_merges_metrics(tmp_path):
    data_dir = make_synthetic_dataset(
        str(tmp_path / "data"), records_per_split=2, duration_ms=1200
    )
    out_dir = str(tmp_path / "run")
    port = "29781"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), port, data_dir, out_dir],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                rec = json.loads(line[len("WORKER_RESULT "):])
                results[rec["process"]] = rec
    assert sorted(results) == [0, 1]

    # the Trainer derived each host's dataset shard automatically
    for pid, rec in results.items():
        assert rec["host_id"] == pid
        assert rec["num_hosts"] == 2
        assert rec["step"] == 2

    # merged eval: every host computes the identical folded mAP
    assert results[0]["best_metric"] == results[1]["best_metric"]

    # single-writer logging/checkpointing (process 0 only)
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    with open(metrics_path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    # one epoch summary + one val line (+ per-step logs); each logged
    # once — no duplicated step records from a second writer
    steps_seen = [(l["step"], tuple(sorted(l))) for l in lines]
    assert len(steps_seen) == len(set(steps_seen))
    assert any("map" in l for l in lines)
    assert os.path.exists(os.path.join(out_dir, "checkpoints", "last"))
