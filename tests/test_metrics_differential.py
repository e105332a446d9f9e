"""Differential fuzz: production mAP vs a literal COCOeval port.

The production metric (train/metrics.py) re-derives COCO semantics in
vectorized numpy (prefix-stable matching, envelope via
maximum.accumulate, searchsorted interpolation). This test fuzzes it
against ``tests/cocoeval_oracle.py`` — a deliberately loopy, line-level
transcription of pycocotools' evaluateImg/accumulate — over hundreds of
random scenes, including the nasty cases: score ties, duplicate boxes,
crowds of FPs, empty classes, classes with GT but no predictions,
predictions for classes with no GT, degenerate (zero-area) boxes, and
>100-detection images exercising the maxDets truncation.
"""

import numpy as np
import pytest

from snn_for_object_detection_tpu.train.metrics import MeanAveragePrecision

from cocoeval_oracle import cocoeval_oracle

KEYS = ("map", "map_50", "mar_1", "mar_10", "mar_100")


def _rand_boxes(rng, n, scale=1.0):
    """Random corner boxes in [0, scale]² with positive extent."""
    xy = rng.random((n, 2)) * scale * 0.8
    wh = rng.random((n, 2)) * scale * 0.4 + 1e-3
    return np.concatenate([xy, xy + wh], axis=1)


def _random_scene(rng, hard: bool):
    """One random eval scene: a few images of GT + predictions."""
    n_imgs = rng.integers(1, 5)
    n_classes = rng.integers(1, 4)
    preds, targets = [], []
    for _ in range(n_imgs):
        n_gt = rng.integers(0, 7)
        gt_boxes = _rand_boxes(rng, n_gt)
        gt_labels = rng.integers(0, n_classes, n_gt)

        # predictions: jittered copies of GT (varying IoU) + pure FPs
        parts_b, parts_l = [], []
        if n_gt:
            n_match = rng.integers(0, n_gt * 2 + 1)
            src = rng.integers(0, n_gt, n_match)
            jitter = rng.normal(0, 0.05 * rng.random(), (n_match, 4))
            parts_b.append(gt_boxes[src] + jitter)
            lab = gt_labels[src].copy()
            # some matched boxes get the WRONG class
            flip = rng.random(n_match) < 0.2
            lab[flip] = rng.integers(0, n_classes, int(flip.sum()))
            parts_l.append(lab)
        n_fp = rng.integers(0, 140 if hard else 12)
        parts_b.append(_rand_boxes(rng, n_fp))
        parts_l.append(rng.integers(0, n_classes + 1, n_fp))  # incl. a
        # class id that may have zero GT anywhere
        boxes = (
            np.concatenate(parts_b) if parts_b else np.zeros((0, 4))
        )
        labels = (
            np.concatenate(parts_l) if parts_l else np.zeros(0, np.int64)
        )
        scores = rng.random(len(boxes))
        if hard:
            # force score ties and duplicate boxes
            scores = np.round(scores, 1)
            if len(boxes) > 2:
                boxes[1] = boxes[0]
                scores[1] = scores[0]
                labels[1] = labels[0]
        if hard and len(boxes):
            # a degenerate zero-area box
            boxes[0, 2:] = boxes[0, :2]

        preds.append({"boxes": boxes, "scores": scores, "labels": labels})
        targets.append({"boxes": gt_boxes, "labels": gt_labels})
    return preds, targets


@pytest.mark.parametrize("hard", [False, True])
def test_fuzz_vs_cocoeval_oracle(hard):
    rng = np.random.default_rng(42 if hard else 7)
    n_cases = 60 if hard else 150
    for case in range(n_cases):
        preds, targets = _random_scene(rng, hard)
        metric = MeanAveragePrecision()
        metric.update(preds, targets)
        got = metric.compute()
        want = cocoeval_oracle(preds, targets)
        for k in KEYS:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (
                f"case {case}: {k} mismatch: got {got[k]}, oracle "
                f"{want[k]}\npreds={preds}\ntargets={targets}"
            )


def test_accumulation_across_updates_matches_single_shot():
    """update() called per batch must equal one bulk evaluation."""
    rng = np.random.default_rng(3)
    all_p, all_t = [], []
    metric = MeanAveragePrecision()
    for _ in range(5):
        preds, targets = _random_scene(rng, hard=False)
        metric.update(preds, targets)
        all_p.extend(preds)
        all_t.extend(targets)
    got = metric.compute()
    want = cocoeval_oracle(all_p, all_t)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_merge_matches_oracle():
    """Multi-host merge path: two shard accumulators folded together
    must equal the oracle on the union."""
    rng = np.random.default_rng(9)
    m0, m1 = MeanAveragePrecision(), MeanAveragePrecision()
    all_p, all_t = [], []
    for i in range(4):
        preds, targets = _random_scene(rng, hard=False)
        (m0 if i % 2 == 0 else m1).update(preds, targets)
        all_p.extend(preds)
        all_t.extend(targets)
    # merge order: host 0's images first, then host 1's — the oracle
    # list must be in the same order for stable-sort tie behavior
    ordered_p, ordered_t = [], []
    ordered_p.extend(m0._preds)
    ordered_t.extend(m0._targets)
    ordered_p.extend(m1._preds)
    ordered_t.extend(m1._targets)
    m0.merge(m1)
    got = m0.compute()
    want = cocoeval_oracle(ordered_p, ordered_t)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
