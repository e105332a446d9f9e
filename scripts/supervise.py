#!/usr/bin/env python3
"""Training supervisor: failure detection + automatic restart/resume.

The reference has no failure handling beyond manual resume
(SURVEY.md §5.3). This supervisor runs ``main.py fit`` with
``--ckpt_path=auto`` (resume from the run's own last checkpoint),
watches the run's ``metrics.jsonl`` heartbeat, and kills + relaunches
the trainer when it goes stale — covering hung accelerator RPCs,
OOM-killed processes, and preemptions. Combined with Orbax top-k
checkpoints, training survives any single-process failure.

Usage:
  python scripts/supervise.py --out-dir log/run --stall-timeout 600 -- \
      python main.py fit --config config/config.yaml \
      --trainer.out_dir=log/run
(``--ckpt_path=auto`` is appended automatically.)
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def heartbeat(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except FileNotFoundError:
        return 0.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--stall-timeout", type=float, default=600.0,
                        help="seconds without a metrics heartbeat before "
                             "the trainer is considered hung")
    parser.add_argument("--startup-grace", type=float, default=1800.0,
                        help="allowance for the first compile")
    parser.add_argument("--max-restarts", type=int, default=10)
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="training command after --")
    args = parser.parse_args()
    cmd = [c for c in args.cmd if c != "--"]
    if not cmd:
        parser.error("training command required after --")
    if not any(a.startswith("--ckpt_path") for a in cmd):
        cmd = cmd + ["--ckpt_path=auto"]

    metrics = os.path.join(args.out_dir, "metrics.jsonl")
    restarts = 0
    while True:
        start = time.time()
        hb0 = heartbeat(metrics)
        print(f"[supervisor] launching (restart {restarts}): "
              f"{' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(10)
            if proc.poll() is not None:
                # exited during the sleep — not a stall
                break
            hb = heartbeat(metrics)
            alive_for = time.time() - start
            budget = (
                args.startup_grace
                if hb <= hb0
                else args.stall_timeout
            )
            last_beat = max(hb, start if hb <= hb0 else hb)
            if time.time() - last_beat > budget:
                print(
                    f"[supervisor] heartbeat stale for "
                    f"{time.time() - last_beat:.0f}s after {alive_for:.0f}s "
                    "— killing trainer",
                    flush=True,
                )
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                stalled = True
                break
        if not stalled and proc.returncode == 0:
            print("[supervisor] training finished cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] max restarts exceeded", flush=True)
            return 1
        print(f"[supervisor] restarting (exit={proc.returncode}, "
              f"stalled={stalled})", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    sys.exit(main())
