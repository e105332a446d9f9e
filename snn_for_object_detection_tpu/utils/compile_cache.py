"""Persistent XLA compilation cache.

TPU train-step compiles through the remote compile service take
minutes (2-7 min for full train steps; see
.claude/skills/verify/SKILL.md timing notes). XLA's persistent
compilation cache keys compiled executables by HLO hash and reuses
them across processes, so a supervised relaunch
(``scripts/supervise.py``), a resumed run, or a re-run of the same
config skips compilation entirely. ``main.py`` enables it by default
(``--compile_cache`` to relocate, ``--compile_cache=`` to disable).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join("~", ".cache", "snn_tpu_jax")


def reset_compile_cache() -> None:
    """Reset the once-per-process cache module so a subsequent config
    change takes effect. Keeps the private-API knowledge in ONE place
    (the test cleanup uses it too)."""
    try:
        from jax._src.compilation_cache import reset_cache
    except ImportError:  # older jax without the hook
        return
    try:
        reset_cache()
    except Exception as e:  # a failed reset must not be silent: the
        # next enable would keep writing to the old directory
        print(f"[compile-cache] reset failed: {e!r}", flush=True)


def enable_compile_cache(
    path: str = DEFAULT_DIR, min_compile_seconds: float = 1.0
) -> str:
    """Enable the persistent XLA compilation cache at ``path``.

    :param path: Cache directory (created if missing; ``~`` expanded).
    :param min_compile_seconds: Only executables whose compile took at
        least this long are persisted (sub-second compiles are cheaper
        to redo than to load).
    :return: The expanded cache directory path.
    """
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    # The cache module initializes ONCE per process: changing the dir
    # after any compile has happened (or after a previous enable) is
    # silently ignored without a reset.
    reset_compile_cache()
    jax.config.update("jax_compilation_cache_dir", path)
    for name, value in (
        ("jax_persistent_cache_min_compile_time_secs",
         float(min_compile_seconds)),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(name, value)
        except AttributeError:  # older jax without the knob
            pass
    return path
