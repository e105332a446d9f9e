#!/usr/bin/env python3
"""Validate an on-disk GEN1 / 1Mpx dataset layout before training.

One command answers "will `main.py fit --config config/gen1_repro.yaml`
run on this disk?" — the moment the real Prophesee datasets land,
reproduction is `python scripts/check_gen1.py ./data && python main.py
fit --config config/gen1_repro.yaml` (see docs/training.md, "GEN1
reproduction runbook").

Checks per split (train/val/test):
  - every ``*_bbox.npy`` has its paired ``*_td.dat`` (and vice versa) —
    the pairing contract of PropheseeDataModule._files
    (reference layout: /root/reference/utils/datasets.py:172-199);
  - .dat header parses, event size is 8 bytes, payload length is a
    whole number of records;
  - sampled events: timestamps non-decreasing, x/y within the dataset
    geometry (304x240 GEN1 / 1280x720 1Mpx; 1Mpx labels may exceed the
    x-clip the loader applies, datasets.py:216-218);
  - labels: structured dtype with the expected fields (GEN1 time field
    'ts', 1Mpx 't'), class_id within the dataset's class count,
    non-negative box sizes.

Usage:
    python scripts/check_gen1.py DATA_DIR [--dataset gen1|1mpx]
                                 [--max-files N]

Exit code 0 = ready; 1 = problems found (each printed).

Host-side only (numpy; no jax import) so it runs anywhere, including
during a TPU-tunnel outage.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snn_for_object_detection_tpu.data.psee import EventReader  # noqa: E402
from snn_for_object_detection_tpu.data.prophesee import (  # noqa: E402
    DATASET_GEOMETRY,
)

SPLITS = ("train", "val", "test")
LABEL_FIELDS = ("x", "y", "w", "h", "class_id")


def check_split(
    data_dir: str, dataset: str, split: str, max_files: int
) -> list[str]:
    height, width, time_field, classes = DATASET_GEOMETRY[dataset]
    split_dir = os.path.join(data_dir, dataset, split)
    problems: list[str] = []
    if not os.path.isdir(split_dir):
        return [f"{split}: missing directory {split_dir}"]

    gt_files = sorted(glob.glob(os.path.join(split_dir, "*_bbox.npy")))
    dat_files = sorted(glob.glob(os.path.join(split_dir, "*_td.dat")))
    if not gt_files:
        problems.append(f"{split}: no *_bbox.npy files in {split_dir}")
    expect_dat = {p.replace("_bbox.npy", "_td.dat") for p in gt_files}
    for missing in sorted(expect_dat - set(dat_files)):
        problems.append(f"{split}: label without events: {missing}")
    expect_gt = {p.replace("_td.dat", "_bbox.npy") for p in dat_files}
    for missing in sorted(expect_gt - set(gt_files)):
        problems.append(f"{split}: events without label: {missing}")

    dat_set = set(dat_files)
    pairs = [
        (g, g.replace("_bbox.npy", "_td.dat"))
        for g in gt_files
        if g.replace("_bbox.npy", "_td.dat") in dat_set
    ]
    n_events_total = 0
    n_boxes_total = 0
    for gt_path, dat_path in pairs[:max_files]:
        tag = f"{split}/{os.path.basename(dat_path)}"
        # --- events ---
        try:
            reader = EventReader(dat_path)
        except Exception as e:
            problems.append(f"{tag}: unreadable .dat header ({e})")
            continue
        n = reader.n_events
        n_events_total += n
        if n == 0:
            problems.append(f"{tag}: zero events")
        else:
            # sample head/tail slices: monotonic time, coords in range
            idx = np.r_[0 : min(n, 50_000), max(n - 50_000, 0) : n]
            recs = reader._records[np.unique(idx)]
            t = recs[:, 0]
            if np.any(np.diff(t.astype(np.int64)) < 0):
                problems.append(f"{tag}: timestamps not sorted")
            x = recs[:, 1] & 0x3FFF
            y = (recs[:, 1] >> 14) & 0x3FFF
            if int(x.max()) >= width or int(y.max()) >= height:
                problems.append(
                    f"{tag}: event coords out of {width}x{height} "
                    f"(max x={int(x.max())}, y={int(y.max())})"
                )
        # --- labels ---
        tag = f"{split}/{os.path.basename(gt_path)}"
        try:
            gt = np.load(gt_path)
        except Exception as e:
            problems.append(f"{tag}: unreadable .npy ({e})")
            continue
        names = gt.dtype.names or ()
        for field in (time_field, *LABEL_FIELDS):
            if field not in names:
                problems.append(
                    f"{tag}: missing GT field '{field}' "
                    f"(dataset '{dataset}' expects time field "
                    f"'{time_field}'; has {list(names)})"
                )
        if {time_field, *LABEL_FIELDS} <= set(names) and len(gt):
            n_boxes_total += len(gt)
            cid = gt["class_id"].astype(np.int64)
            if cid.min() < 0 or cid.max() >= len(classes):
                problems.append(
                    f"{tag}: class_id out of [0, {len(classes)}) "
                    f"(found {cid.min()}..{cid.max()})"
                )
            if np.any(gt["w"] < 0) or np.any(gt["h"] < 0):
                problems.append(f"{tag}: negative box sizes")

    print(
        f"[{dataset}/{split}] {len(pairs)} paired recordings"
        + (f" (checked {min(len(pairs), max_files)})" if pairs else "")
        + f", {n_events_total:,} events, {n_boxes_total:,} boxes sampled"
    )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data_dir", help="root containing <dataset>/<split>/")
    ap.add_argument("--dataset", default="gen1",
                    choices=sorted(DATASET_GEOMETRY))
    ap.add_argument("--max-files", type=int, default=16,
                    help="recordings to deep-check per split")
    args = ap.parse_args()

    problems: list[str] = []
    for split in SPLITS:
        problems += check_split(
            args.data_dir, args.dataset, split, args.max_files
        )
    if problems:
        print(f"\nFAIL — {len(problems)} problem(s):")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"\nOK — {args.dataset} layout under {args.data_dir} is "
          "ready for training")
    return 0


if __name__ == "__main__":
    sys.exit(main())
