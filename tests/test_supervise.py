"""Supervisor tests: stall detection, restart with resume, clean exit."""

import os
import subprocess
import sys
import textwrap


def run_supervisor(tmp_path, trainer_body, stall=2, grace=4, max_restarts=3):
    trainer = tmp_path / "fake_trainer.py"
    trainer.write_text(textwrap.dedent(trainer_body))
    out_dir = tmp_path / "run"
    out_dir.mkdir(exist_ok=True)
    cmd = [
        sys.executable, "scripts/supervise.py",
        "--out-dir", str(out_dir),
        "--stall-timeout", str(stall),
        "--startup-grace", str(grace),
        "--max-restarts", str(max_restarts),
        "--", sys.executable, str(trainer), str(out_dir),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc, out_dir


def test_supervisor_clean_exit(tmp_path):
    proc, out = run_supervisor(
        tmp_path,
        """
        import sys, time, os
        out = sys.argv[1]
        # ignore the auto-appended --ckpt_path=auto
        for i in range(3):
            with open(os.path.join(out, "metrics.jsonl"), "a") as f:
                f.write('{"step": %d}\\n' % i)
            time.sleep(0.2)
        """,
    )
    assert proc.returncode == 0
    assert "finished cleanly" in proc.stdout


def test_supervisor_restarts_hung_trainer(tmp_path):
    """A trainer that heartbeats then hangs must be killed and
    relaunched; the relaunch (which exits cleanly) ends the run."""
    proc, out = run_supervisor(
        tmp_path,
        """
        import sys, time, os, json
        out = sys.argv[1]
        marker = os.path.join(out, "attempt")
        n = 0
        if os.path.exists(marker):
            n = int(open(marker).read())
        open(marker, "w").write(str(n + 1))
        with open(os.path.join(out, "metrics.jsonl"), "a") as f:
            f.write('{"beat": %d}\\n' % n)
        if n == 0:
            time.sleep(60)  # hang forever on the first attempt
        """,
        stall=2, grace=3,
    )
    assert proc.returncode == 0
    assert "killing trainer" in proc.stdout
    assert "restarting" in proc.stdout
    assert int((tmp_path / "run" / "attempt").read_text()) == 2


def test_supervisor_max_restarts(tmp_path):
    proc, out = run_supervisor(
        tmp_path,
        """
        import sys
        sys.exit(3)  # always crash
        """,
        max_restarts=2,
    )
    assert proc.returncode == 1
    assert "max restarts exceeded" in proc.stdout
