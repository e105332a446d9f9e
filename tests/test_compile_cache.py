"""Persistent XLA compilation cache (utils.compile_cache)."""

import os

import jax
import jax.numpy as jnp

from snn_for_object_detection_tpu.utils import enable_compile_cache


def test_cache_dir_populates_and_roundtrips(tmp_path):
    path = enable_compile_cache(
        str(tmp_path / "jcache"), min_compile_seconds=0.0
    )
    try:
        assert os.path.isdir(path)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(path)
        assert entries, "no cache entries written"

        # second compile of the SAME computation under a fresh jit
        # wrapper hits the cache (no error, same result) — the
        # cross-process reuse path supervise.py relies on
        g = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
        assert float(g(jnp.ones((64, 64)))) == float(f(jnp.ones((64, 64))))
    finally:
        # don't leave a temp cache configured for later tests
        jax.config.update("jax_compilation_cache_dir", None)
        from snn_for_object_detection_tpu.utils.compile_cache import (
            reset_compile_cache,
        )

        reset_compile_cache()


def test_cli_flag_disables(monkeypatch):
    """main.py accepts --compile_cache= (empty) without enabling."""
    import main as cli

    called = []
    monkeypatch.setattr(
        "snn_for_object_detection_tpu.utils.enable_compile_cache",
        lambda p: called.append(p),
    )
    # parse-only invocation: bad subcommand exits before any work
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["--compile_cache=", "bogus_subcommand"])
    assert called == []
