#!/usr/bin/env python3
"""Export a deployable model artifact from a training checkpoint.

Strips optimizer state (Adamax moments double the size) and keeps
(params, stats, step, epoch) — the inference-complete artifact, the
analogue of the reference's shipped ``nets/tiny_yolo/tiny_yolo_gen1.ckpt``.

Usage:
  python scripts/export_model.py <training_ckpt_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Checkpoint surgery is host-side work — run on CPU so the script
# works without a live accelerator (and regardless of tunnel health).
jax.config.update("jax_platforms", "cpu")

from snn_for_object_detection_tpu.train.checkpoint import (
    load_single,
    save_single,
)


def main():
    src, dst = sys.argv[1], sys.argv[2]
    state = load_single(src)
    slim = {
        "params": state["params"],
        "stats": state["stats"],
        "step": state.get("step", 0),
        "epoch": state.get("epoch", 0),
    }
    if "ema_params" in state:
        # EMA runs are deployed with their averaged weights — the
        # weights the checkpoint's val metrics were measured on
        slim["ema_params"] = state["ema_params"]
    save_single(dst, slim)
    print(f"exported {src} -> {dst} (optimizer state stripped)")


if __name__ == "__main__":
    main()
