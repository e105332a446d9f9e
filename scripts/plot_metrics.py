#!/usr/bin/env python3
"""Render a training-curve PNG from a run's metrics.jsonl (the
analogue of the reference's shipped training_graph.png).

Usage: python scripts/plot_metrics.py <run_dir_or_metrics.jsonl> [out.png]
"""

import json
import os
import sys


def main():
    path = sys.argv[1]
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(path), "training_graph.png"
    )

    steps_l, losses, steps_m, maps = [], [], [], []
    for line in open(path):
        d = json.loads(line)
        if "epoch_train_loss" in d:
            steps_l.append(d["step"])
            losses.append(d["epoch_train_loss"])
        if "map_50" in d:
            steps_m.append(d["step"])
            maps.append(d["map_50"])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots(figsize=(8, 4.5))
    ax1.plot(steps_l, losses, color="tab:blue", label="train loss")
    ax1.set_xlabel("step")
    ax1.set_ylabel("train loss", color="tab:blue")
    if maps:
        ax2 = ax1.twinx()
        ax2.plot(steps_m, maps, color="tab:red", marker="o",
                 label="val mAP@0.5")
        ax2.set_ylabel("val mAP@0.5", color="tab:red")
        ax2.set_ylim(bottom=0)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
