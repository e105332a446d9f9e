#!/usr/bin/env python3
"""Import a reference (PyTorch Lightning) checkpoint into JAX pytrees.

Maps the reference SODa ``state_dict`` (torch OIHW convs, BatchNorm
gamma/running stats, the per-scale head trees of
/root/reference/models/generator.py:403-413, anchor parameters of
/root/reference/utils/anchors.py:26-27) onto this framework's
(params, stats) pytrees, so the day the reference's GEN1 weights
(nets/tiny_yolo/tiny_yolo_gen1.ckpt — an LFS pointer in this image)
and datasets become available, the 22.8-mAP parity check is one
command.

Key-name correspondence (derived from the reference's module
registration, generator.py:82-143,403-413,521-525):

  JAX path                         torch state_dict key
  backbone/bJ/lK/...            -> base_net.net.net.J.K...
  neck/bJ/lK/...                -> neck_net.net.net.J.K...
  headI/base/bJ/lK/...          -> head_net.model_I.base_net.net.J.K...
  headI/box/bJ/lK/...           -> head_net.model_I.box_net.net.J.K...
  headI/cls/bJ/lK/...           -> head_net.model_I.cls_net.net.J.K...
  nested block pair bJ/lK       -> .net.J.K  (one per nesting level)
  leaf w (conv, HWIO)           -> .weight   (OIHW, transposed)
  leaf scale / bias (BatchNorm) -> .weight / .bias
  stats mean / var (BatchNorm)  -> .running_mean / .running_var

``num_batches_tracked`` and norse-cell buffers are ignored;
``head_net.anchor_gen_I.sizes/ratios`` are checked against the model's
anchor tables (pass ``--model.init_args.anchor_sizes/...`` overrides
if they differ).

Usage:
  python scripts/import_torch_ckpt.py <ckpt.ckpt> <out_dir> \
      [--config config/config.yaml] [--model.init_args.K=V ...]

The output directory is an Orbax checkpoint holding
{params, stats, step, epoch} — loadable via ``ckpt_path`` in
validate/test/predict, same as a scripts/export_model.py artifact.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_LEAF_PARAM = {"w": "weight", "scale": "weight", "bias": "bias"}
_LEAF_STAT = {"mean": "running_mean", "var": "running_var"}


def jax_to_torch_key(path: list, collection: str = "params") -> str:
    """Translate one JAX pytree path (list of str keys) to the
    reference's state_dict key for that tensor."""
    head_m = re.fullmatch(r"head(\d+)", path[0])
    if head_m:
        part = {"base": "base_net", "box": "box_net", "cls": "cls_net"}[path[1]]
        prefix = f"head_net.model_{head_m.group(1)}.{part}"
        pairs = path[2:-1]
    elif path[0] == "backbone":
        prefix = "base_net.net"
        pairs = path[1:-1]
    elif path[0] == "neck":
        prefix = "neck_net.net"
        pairs = path[1:-1]
    else:
        raise KeyError(f"unmapped component {path[0]!r}")
    if len(pairs) % 2:
        raise KeyError(f"odd branch/layer nesting in {'/'.join(path)}")
    out = prefix
    for b, l in zip(pairs[::2], pairs[1::2]):
        bm = re.fullmatch(r"b(\d+)", b)
        lm = re.fullmatch(r"l(\d+)", l)
        if not (bm and lm):
            raise KeyError(f"unexpected path tokens {b}/{l} in {'/'.join(path)}")
        out += f".net.{bm.group(1)}.{lm.group(1)}"
    leaf_map = _LEAF_PARAM if collection == "params" else _LEAF_STAT
    leaf = path[-1]
    if leaf not in leaf_map:
        raise KeyError(f"unmapped leaf {leaf!r} in {'/'.join(path)}")
    return out + "." + leaf_map[leaf]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _assign(tree, sd, used, missing, collection, path=()):
    """Recursively replace each leaf of ``tree`` with the transformed
    state_dict tensor; returns the new tree."""
    if isinstance(tree, dict):
        return {
            k: _assign(v, sd, used, missing, collection, path + (str(k),))
            for k, v in tree.items()
        }
    pstr = list(path)
    try:
        key = jax_to_torch_key(pstr, collection)
    except KeyError as e:
        missing.append((os.path.join(*pstr), f"no mapping: {e}"))
        return tree
    if key not in sd:
        missing.append((os.path.join(*pstr), f"absent torch key {key}"))
        return tree
    src = _to_numpy(sd[key])
    dst = np.asarray(tree)
    if pstr[-1] == "w":
        # torch conv weight OIHW -> our HWIO
        src = np.transpose(src, (2, 3, 1, 0))
    if src.shape != dst.shape:
        raise ValueError(
            f"shape mismatch at {'/'.join(pstr)}: checkpoint {src.shape} "
            f"vs model {dst.shape} — wrong architecture config?"
        )
    used.add(key)
    return src.astype(dst.dtype)


def import_state_dict(model, state_dict, strict: bool = True):
    """Map a reference ``state_dict`` onto ``model``'s (params, stats).

    Returns (params, stats, report) where report lists consumed,
    ignored and unmatched keys. ``strict`` raises if any model leaf
    found no checkpoint tensor or any non-ignorable checkpoint tensor
    went unused.
    """
    import jax

    params, stats = model.init(jax.random.PRNGKey(0))
    used: set = set()
    missing: list = []
    new_params = _assign(params, state_dict, used, missing, "params")
    new_stats = _assign(stats, state_dict, used, missing, "stats")

    ignorable = re.compile(
        r"(\.num_batches_tracked$)|(^head_net\.anchor_gen_\d+\.(sizes|ratios)$)"
    )
    unused = [
        k for k in state_dict
        if k not in used and not ignorable.search(k)
    ]
    anchor_report = _check_anchors(model, state_dict)
    report = {
        "consumed": sorted(used),
        "missing": missing,
        "unused": sorted(unused),
        "anchors": anchor_report,
    }
    if strict and (missing or unused):
        raise ValueError(
            "import mismatch:\n  model leaves without tensors: "
            f"{missing}\n  unconsumed checkpoint keys: {unused}"
        )
    return new_params, new_stats, report


def _check_anchors(model, sd):
    """Compare the checkpoint's per-scale anchor sizes/ratios with the
    model's tables; anchors are trace-time constants here, so a
    mismatch must be fixed via model config, not import."""
    out = []
    for i in range(len(getattr(model, "scale_sizes", []))):
        k = f"head_net.anchor_gen_{i}.sizes"
        rk = f"head_net.anchor_gen_{i}.ratios"
        if k not in sd:
            continue
        if rk not in sd:
            out.append({
                "scale": i, "match": False,
                "error": f"checkpoint has {k} but no {rk}",
            })
            continue
        ck_sizes = _to_numpy(sd[k]).ravel()
        ck_ratios = _to_numpy(sd[rk]).ravel()
        mine_sizes = np.asarray(model.scale_sizes[i]).ravel()
        mine_ratios = np.asarray(model.anchor_ratios).ravel()
        ok = (
            ck_sizes.shape == mine_sizes.shape
            and np.allclose(ck_sizes, mine_sizes, atol=1e-6)
            and ck_ratios.shape == mine_ratios.shape
            and np.allclose(ck_ratios, mine_ratios, atol=1e-6)
        )
        out.append({
            "scale": i, "match": bool(ok),
            "ckpt_sizes": ck_sizes.tolist(), "model_sizes": mine_sizes.tolist(),
            "ckpt_ratios": ck_ratios.tolist(),
            "model_ratios": mine_ratios.tolist(),
        })
    return out


def load_lightning_state_dict(path: str) -> dict:
    """Read a Lightning .ckpt (torch.save archive) -> flat state_dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        return blob["state_dict"]
    return blob


def main(argv=None):
    import jax

    # Checkpoint conversion is host-side work — run on CPU so the
    # script works without a live accelerator.
    jax.config.update("jax_platforms", "cpu")
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    src, dst = argv[0], argv[1]
    rest = argv[2:]
    configs, overrides = [], []
    i = 0
    while i < len(rest):
        if rest[i] == "--config":
            configs.append(rest[i + 1])
            i += 2
        else:
            overrides.append(rest[i])
            i += 1
    if not configs:
        configs = ["config/config.yaml"]

    from snn_for_object_detection_tpu.utils.config import (
        instantiate,
        load_config,
    )

    cfg = load_config(configs, overrides)
    model = instantiate(cfg["model"])
    sd = load_lightning_state_dict(src)
    params, stats, report = import_state_dict(model, sd, strict=True)

    for a in report["anchors"]:
        if not a["match"]:
            detail = a.get("error") or (
                f"checkpoint sizes={a.get('ckpt_sizes')} "
                f"ratios={a.get('ckpt_ratios')} vs model "
                f"sizes={a.get('model_sizes')} "
                f"ratios={a.get('model_ratios')}"
            )
            raise SystemExit(
                f"anchor mismatch at scale {a['scale']}: {detail} — "
                "pass --model.init_args.anchor_sizes/anchor_ratios "
                "overrides and re-run"
            )

    from snn_for_object_detection_tpu.train.checkpoint import save_single

    save_single(dst, {"params": params, "stats": stats,
                      "step": 0, "epoch": 0})
    print(
        f"imported {len(report['consumed'])} tensors from {src} -> {dst}"
        f" ({len(report['anchors'])} anchor scales verified)"
    )


if __name__ == "__main__":
    main()
