"""YAML config system with class-path instantiation and CLI overrides.

Reproduces the reference's LightningCLI/jsonargparse UX (SURVEY.md
§5.6): YAML files with ``class_path`` / ``init_args`` nodes
(config/config.yaml:4-20), dotted-key CLI overrides beating YAML, and
a resolved-config snapshot written next to the run outputs
(``save_config_kwargs={"overwrite": True}``, main.py:34).
"""

from __future__ import annotations

import copy
import importlib
import os
from typing import Any, Dict, Sequence

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def deep_update(base: Dict, override: Dict) -> Dict:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    for k, v in override.items():
        if (
            isinstance(v, dict)
            and isinstance(base.get(k), dict)
        ):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def parse_overrides(args: Sequence[str]) -> Dict[str, Any]:
    """Parse ``--a.b.c=value`` CLI args into a nested dict; values go
    through YAML parsing (so ``true``, ``3``, ``[1,2]`` work)."""
    out: Dict[str, Any] = {}
    for arg in args:
        if not arg.startswith("--") or "=" not in arg:
            raise ValueError(f"Expected --dotted.key=value, got {arg!r}")
        key, _, raw = arg[2:].partition("=")
        value = yaml.safe_load(raw)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def load_config(
    config_paths: Sequence[str], overrides: Sequence[str] = ()
) -> Dict[str, Any]:
    """Merge config files left-to-right, then CLI overrides on top."""
    cfg: Dict[str, Any] = {}
    for path in config_paths:
        deep_update(cfg, load_yaml(path))
    deep_update(cfg, parse_overrides(overrides))
    return cfg


def _import_class(path: str):
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate(node: Any) -> Any:
    """Recursively build objects from ``class_path``/``init_args`` nodes
    (jsonargparse semantics, config/config.yaml:4-20)."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls = _import_class(node["class_path"])
            kwargs = {
                k: instantiate(v)
                for k, v in (node.get("init_args") or {}).items()
            }
            return cls(**kwargs)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def save_config_snapshot(cfg: Dict[str, Any], out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(copy.deepcopy(cfg), f, sort_keys=False)
    return path
