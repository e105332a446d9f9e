"""Orbax checkpointing with top-k-by-metric retention and resume.

The TPU-native equivalent of the reference's Lightning checkpointing
(SURVEY.md §5.4): ``ModelCheckpoint(save_top_k=4, monitor=map,
mode=max)`` + resume via ``ckpt_path`` (config/config.yaml:1,45-49).
Checkpoints are self-describing: (params, stats, opt_state, step,
epoch) plus a JSON metadata blob with the monitored metric and config
snapshot (the ``save_hyperparameters`` analogue, soda.py:67).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from snn_for_object_detection_tpu.parallel import distributed as dist


class CheckpointManager:
    """Minimal top-k checkpoint manager over an Orbax PyTreeCheckpointer."""

    def __init__(
        self,
        directory: str,
        save_top_k: int = 4,
        monitor: str = "map",
        mode: str = "max",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self._ckpt = ocp.PyTreeCheckpointer()
        self._index_path = os.path.join(self.directory, "index.json")
        self._latest_name: Optional[str] = None
        self._index: Dict[str, float] = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    def _flush_index(self) -> None:
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def save(
        self,
        step: int,
        state: Any,
        metric: Optional[float] = None,
        meta: Optional[Dict] = None,
    ) -> Optional[str]:
        """Save ``state`` (arbitrary pytree) tagged by step; keep only
        the top-k by the monitored metric (None = always keep 'last').

        Multi-host: EVERY process must call this together — the Orbax
        save is a cross-process collective (its internal barriers hang
        or mismatch otherwise). Filesystem bookkeeping (pruning, index,
        symlink) runs on process 0 only; in-memory retention state is
        kept identical on all processes."""
        primary = dist.is_primary()
        name = f"step_{step:09d}"
        path = os.path.join(self.directory, name)
        if primary:
            if os.path.exists(path):
                shutil.rmtree(path)
            # a previously-protected (pruned-but-latest) checkpoint can
            # be deleted once a newer save supersedes it
            if (
                self._latest_name
                and self._latest_name != name
                and self._latest_name not in self._index
            ):
                stale = os.path.join(self.directory, self._latest_name)
                if os.path.exists(stale):
                    shutil.rmtree(stale)
                stale_meta = stale + ".meta.json"
                if os.path.exists(stale_meta):
                    os.remove(stale_meta)
        # Orbax's save checks directory existence on EVERY process; without
        # a barrier a non-primary process on the shared filesystem can race
        # the primary's rmtree above (observe the old dir mid-delete) when a
        # step is re-saved after resume.
        dist.barrier("ckpt_pre_save")
        self._ckpt.save(path, state)
        self._latest_name = name
        if primary and meta is not None:
            with open(os.path.join(self.directory, name + ".meta.json"), "w") as f:
                json.dump(meta, f, indent=1, default=str)
        if metric is not None:
            self._index[name] = float(metric)
            self._prune()
        if primary:
            self._flush_index()
            # maintain a 'last' symlink for unconditional resume
            last = os.path.join(self.directory, "last")
            if os.path.islink(last):
                os.unlink(last)
            elif os.path.exists(last):
                shutil.rmtree(last)
            os.symlink(path, last)
        return path

    def _prune(self) -> None:
        if self.save_top_k <= 0:
            return
        ranked = sorted(
            self._index.items(),
            key=lambda kv: kv[1],
            reverse=(self.mode == "max"),
        )
        for name, _ in ranked[self.save_top_k :]:
            path = os.path.join(self.directory, name)
            # never delete the newest checkpoint's data or metadata —
            # 'last' points at it and resume must always work; both are
            # removed once a newer save supersedes it (see save())
            if name != self._latest_name and dist.is_primary():
                if os.path.exists(path):
                    shutil.rmtree(path)
                meta = path + ".meta.json"
                if os.path.exists(meta):
                    os.remove(meta)
            del self._index[name]

    def best_path(self) -> Optional[str]:
        if not self._index:
            return None
        ranked = sorted(
            self._index.items(),
            key=lambda kv: kv[1],
            reverse=(self.mode == "max"),
        )
        return os.path.join(self.directory, ranked[0][0])

    def stored_keys(self, path: Optional[str] = None) -> Optional[set]:
        """Top-level keys present in a saved checkpoint (from Orbax
        metadata, no tensor reads), or None if the structure is not a
        mapping. Lets callers build a restore target matching what was
        actually saved instead of guessing via try/except — a genuinely
        corrupt checkpoint then fails with its real error."""
        if path is None:
            path = os.path.join(self.directory, "last")
        meta = self._ckpt.metadata(os.path.abspath(path))
        # StepMetadata -> TreeMetadata -> dict tree (orbax >= 0.6)
        item = getattr(meta, "item_metadata", meta)
        tree = getattr(item, "tree", item)
        if isinstance(tree, dict):
            return set(tree.keys())
        return None

    def restore(self, path: Optional[str] = None, target: Any = None) -> Any:
        """Restore a checkpoint pytree. ``path=None`` -> 'last'.

        A dict ``target`` is reconciled with the keys the checkpoint
        really contains: target keys the checkpoint lacks — and keys
        the caller sets to None — are dropped and come back ABSENT
        from the result, without reading their data (weights-only
        loads skip the opt_state bytes). Callers read optional keys
        with ``restored.get(...)`` / ``in``; a genuinely corrupt
        checkpoint surfaces its real Orbax error."""
        if path is None:
            path = os.path.join(self.directory, "last")
        path = os.path.abspath(path)
        if target is not None:
            if isinstance(target, dict):
                stored = self.stored_keys(path)
                if stored is not None:
                    trimmed = {
                        k: v
                        for k, v in target.items()
                        if k in stored and v is not None
                    }
                    if trimmed.keys() != stored:
                        # skip unrequested stored keys without reading
                        # their data (e.g. opt_state on a weights-only
                        # load)
                        return self._ckpt.restore(
                            path,
                            args=ocp.args.PyTreeRestore(
                                item=trimmed, partial_restore=True
                            ),
                        )
                    target = trimmed
            return self._ckpt.restore(path, item=target)
        return self._ckpt.restore(path)


def save_single(path: str, state: Any) -> None:
    """One-off checkpoint save (no retention management)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ocp.PyTreeCheckpointer().save(path, state)


def load_single(path: str, target: Any = None) -> Any:
    path = os.path.abspath(path)
    c = ocp.PyTreeCheckpointer()
    return c.restore(path, item=target) if target is not None else c.restore(path)
