#!/usr/bin/env python3
"""CLI entry point: ``python main.py {fit,validate,test,predict}``.

The first-party replacement for the reference's LightningCLI wiring
(/root/reference/main.py:6-35): subcommands, default config files,
YAML ``class_path``/``init_args`` model selection (any SODa subclass),
dotted-key CLI overrides, resolved-config snapshot.

Examples
--------
  python main.py fit --config config/config.yaml
  python main.py fit --data.init_args.dataset=1mpx \
      --model.init_args.num_classes=7
  python main.py test --ckpt_path log/run/checkpoints/last
"""

from __future__ import annotations

import argparse
import os
import sys

import jax


def build(cfg):
    from snn_for_object_detection_tpu.utils.config import instantiate

    model = instantiate(cfg["model"])
    data = instantiate(cfg["data"])
    if tuple(model.in_hw) != (data.height, data.width):
        raise ValueError(
            f"model.in_hw={tuple(model.in_hw)} does not match the "
            f"'{data.dataset}' dataset geometry "
            f"({data.height}, {data.width}) — set model.init_args.in_hw "
            "accordingly (gen1: [240, 304], 1mpx: [720, 1280])"
        )
    trainer_cfg = dict(cfg.get("trainer") or {})
    from snn_for_object_detection_tpu.train import Trainer

    trainer = Trainer(**trainer_cfg)
    return model, data, trainer


def load_model_state(trainer, model, ckpt_path):
    """Restore (params, stats) from a checkpoint directory."""
    import jax.numpy as jnp

    params, stats = model.init(jax.random.PRNGKey(0))
    # restore() trims the target to the keys the checkpoint actually
    # holds (e.g. weights-only exports lack opt_state/step/epoch)
    target = {"params": params, "stats": stats, "opt_state": None,
              "step": 0, "epoch": 0, "ema_params": params}
    restored = trainer.ckpt.restore(ckpt_path, target=target)
    # a run trained with Trainer(ema_decay=...) is deployed with its
    # averaged weights — that is what its val metrics were measured on
    return restored.get("ema_params", restored["params"]), restored["stats"]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument(
        "subcommand", choices=["fit", "validate", "test", "predict"]
    )
    parser.add_argument(
        "--config", action="append", default=None,
        help="YAML config file(s), merged left to right "
             "(default: config/config.yaml)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="join a multi-host run via jax.distributed.initialize() "
             "(coordinator/process env vars or TPU-pod metadata); also "
             "implied by JAX_COORDINATOR_ADDRESS being set",
    )
    parser.add_argument(
        "--compile_cache", default="~/.cache/snn_tpu_jax", metavar="DIR",
        help="persistent XLA compilation cache directory — supervised "
             "relaunches and re-runs of the same config skip the "
             "multi-minute TPU train-step compiles (pass an empty "
             "string to disable; default %(default)s)",
    )
    args, overrides = parser.parse_known_args(argv)

    if args.compile_cache:
        from snn_for_object_detection_tpu.utils import enable_compile_cache

        enable_compile_cache(args.compile_cache)

    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from snn_for_object_detection_tpu.parallel import distributed

        distributed.initialize()
        print(
            f"[distributed] process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.devices())} global devices",
            flush=True,
        )

    from snn_for_object_detection_tpu.utils.config import (
        load_config,
        save_config_snapshot,
    )

    if args.config:
        config_paths = args.config
    else:
        # per-subcommand default config files (reference main.py:11-33:
        # `fit` additionally loads the gitignored logger config)
        config_paths = ["config/config.yaml"]
        if args.subcommand == "fit" and os.path.exists("config/logger.yaml"):
            config_paths.append("config/logger.yaml")
    cfg = load_config(config_paths, overrides)

    model, data, trainer = build(cfg)
    save_config_snapshot(cfg, trainer.out_dir)
    ckpt_path = cfg.get("ckpt_path")

    if args.subcommand == "fit":
        trainer.fit(model, data, ckpt_path=ckpt_path)
    elif args.subcommand == "validate":
        params, stats = load_model_state(trainer, model, ckpt_path)
        trainer.validate(model, data, params, stats)
    elif args.subcommand == "test":
        params, stats = load_model_state(trainer, model, ckpt_path)
        trainer.test(model, data, params, stats)
    elif args.subcommand == "predict":
        from snn_for_object_detection_tpu.utils.config import instantiate

        params, stats = load_model_state(trainer, model, ckpt_path)
        plotter = instantiate(
            cfg.get("plotter")
            or {
                "class_path": "snn_for_object_detection_tpu.utils.Plotter",
                "init_args": {"save_video": True, "show_video": False},
            }
        )
        trainer.predict(model, data, params, stats, plotter)


if __name__ == "__main__":
    main()
