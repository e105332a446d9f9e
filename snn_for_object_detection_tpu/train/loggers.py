"""Experiment-tracker logging backends (SURVEY.md §5.5).

The reference wires a Neptune tracker through a gitignored
``config/logger.yaml`` consumed by LightningCLI
(/root/reference/main.py:13-16). Here the same config surface —
``trainer.logger`` with ``class_path``/``init_args`` — instantiates one
or more of these backends; every metrics payload the Trainer logs is
fanned out to each of them (scalars only), alongside the always-on
stdout + ``metrics.jsonl`` sink.

Backends implement ``log_metrics(step, payload)`` + ``close()`` —
anything else (Neptune, W&B, MLflow) plugs in by exposing the same two
methods via ``class_path``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def _scalars(payload: Dict) -> Dict[str, float]:
    return {
        k: float(v)
        for k, v in payload.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }


class TensorBoardLogger:
    """TensorBoard event-file writer (tensorboardX backend).

    :param log_dir: Event-file directory. Relative paths are resolved
        under the Trainer's ``out_dir`` (so the default "tb" lands next
        to metrics.jsonl and the checkpoints).
    """

    def __init__(self, log_dir: str = "tb"):
        self.log_dir = log_dir
        self._writer = None

    def set_out_dir(self, out_dir: str) -> None:
        """Called by the Trainer before the first log."""
        if not os.path.isabs(self.log_dir):
            self.log_dir = os.path.join(out_dir, self.log_dir)

    def _get_writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = SummaryWriter(self.log_dir)
        return self._writer

    def log_metrics(self, step: int, payload: Dict) -> None:
        writer = self._get_writer()
        for key, value in _scalars(payload).items():
            writer.add_scalar(key, value, step)
        writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None


class CSVLogger:
    """Append-only CSV of every logged payload (the Lightning CSVLogger
    analogue) — trivially greppable/plottable without TensorBoard."""

    def __init__(self, filename: str = "metrics.csv"):
        self.filename = filename
        self._path: Optional[str] = None
        self._columns = None

    def set_out_dir(self, out_dir: str) -> None:
        if not os.path.isabs(self.filename):
            self._path = os.path.join(out_dir, self.filename)
        else:
            self._path = self.filename

    def log_metrics(self, step: int, payload: Dict) -> None:
        assert self._path is not None, "set_out_dir() not called"
        row = {"step": step, **_scalars(payload)}
        if self._columns is None:
            # union schema discovered lazily; rewrite header on change
            self._columns = list(row)
            with open(self._path, "w") as f:
                f.write(",".join(self._columns) + "\n")
        new_cols = [c for c in row if c not in self._columns]
        if new_cols:
            self._columns.extend(new_cols)
            with open(self._path) as f:
                lines = f.read().splitlines()[1:]
            # atomic schema rewrite: a crash mid-write must not lose the
            # prior metric history
            tmp = self._path + ".tmp"
            with open(tmp, "w") as f:
                f.write(",".join(self._columns) + "\n")
                pad = "," * len(new_cols)
                f.writelines(line + pad + "\n" for line in lines)
            os.replace(tmp, self._path)
        with open(self._path, "a") as f:
            f.write(
                ",".join(
                    str(row.get(c, "")) if row.get(c, "") != "" else ""
                    for c in self._columns
                )
                + "\n"
            )

    def close(self) -> None:
        pass
