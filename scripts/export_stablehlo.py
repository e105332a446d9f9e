#!/usr/bin/env python3
"""Export a training checkpoint as a self-contained StableHLO
streaming-predict blob (snn_for_object_detection_tpu/export.py).

The blob bakes in weights + detection decode; a serving process loads
it with `load_predict` and needs no model code, config or checkpoint.

Usage:
  python scripts/export_stablehlo.py <ckpt_dir> <out.stablehlo> \
      [--config config/config.yaml]... [dotted overrides]
  python scripts/export_stablehlo.py nets/tiny_yolo_synth/model \
      predict.stablehlo --config nets/tiny_yolo_synth/config.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Tracing needs only an abstract backend and the blob is lowered for
# every target platform — export on CPU so the script works without a
# live accelerator (and regardless of tunnel health).
jax.config.update("jax_platforms", "cpu")

from snn_for_object_detection_tpu.export import export_predict
from snn_for_object_detection_tpu.train.checkpoint import load_single
from snn_for_object_detection_tpu.utils.config import (
    instantiate,
    load_config,
)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt")
    parser.add_argument("out")
    parser.add_argument("--config", action="append",
                        default=None)
    # default: symbolic batch "b" — one blob serves any camera count;
    # pass an integer for a fixed-shape program
    parser.add_argument("--batch-size", default="b",
                        type=lambda s: int(s) if s.isdigit() else s)
    args, overrides = parser.parse_known_args()

    cfg = load_config(args.config or ["config/config.yaml"], overrides)
    model = instantiate(cfg["model"])
    state = load_single(args.ckpt)
    # EMA-trained checkpoints serve their averaged weights (what the
    # recorded val metrics were measured on)
    params = state.get("ema_params") or state["params"]
    export_predict(
        model, params, state["stats"], args.out,
        batch_size=args.batch_size,
    )
    size = os.path.getsize(args.out)
    print(f"exported {args.ckpt} -> {args.out} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
