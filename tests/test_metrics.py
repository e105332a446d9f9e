"""mAP metric tests against hand-computed COCO-style oracles."""

import numpy as np

from snn_for_object_detection_tpu.train.metrics import (
    MeanAveragePrecision,
    detections_to_map_inputs,
)


def _box(x1, y1, x2, y2):
    return [x1, y1, x2, y2]


def test_perfect_predictions():
    m = MeanAveragePrecision()
    boxes = np.array([_box(0.1, 0.1, 0.3, 0.3), _box(0.5, 0.5, 0.8, 0.9)])
    m.update(
        [{"boxes": boxes, "scores": np.array([0.9, 0.8]),
          "labels": np.array([0, 1])}],
        [{"boxes": boxes, "labels": np.array([0, 1])}],
    )
    r = m.compute()
    assert r["map"] == 1.0
    assert r["map_50"] == 1.0
    assert r["mar_1"] == 1.0
    assert r["mar_100"] == 1.0


def test_complete_miss():
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.array([_box(0.7, 0.7, 0.9, 0.9)]),
          "scores": np.array([0.9]), "labels": np.array([0])}],
        [{"boxes": np.array([_box(0.1, 0.1, 0.3, 0.3)]),
          "labels": np.array([0])}],
    )
    r = m.compute()
    assert r["map"] == 0.0
    assert r["mar_100"] == 0.0


def test_fp_after_tp_keeps_ap_one():
    # TP at score 0.9, FP at 0.8: precision envelope at all recall
    # levels up to 1.0 is 1.0 -> AP = 1.
    gt = np.array([_box(0.1, 0.1, 0.3, 0.3)])
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.vstack([gt[0], _box(0.6, 0.6, 0.7, 0.7)]),
          "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}],
        [{"boxes": gt, "labels": np.array([0])}],
    )
    r = m.compute()
    assert abs(r["map_50"] - 1.0) < 1e-9


def test_half_recall():
    # 2 GT, 1 perfect match -> recall caps at 0.5:
    # 101-point AP = 51/101.
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.array([_box(0.1, 0.1, 0.3, 0.3)]),
          "scores": np.array([0.9]), "labels": np.array([0])}],
        [{"boxes": np.array(
            [_box(0.1, 0.1, 0.3, 0.3), _box(0.5, 0.5, 0.7, 0.7)]),
          "labels": np.array([0, 0])}],
    )
    r = m.compute()
    np.testing.assert_allclose(r["map"], 51 / 101, rtol=1e-9)
    np.testing.assert_allclose(r["mar_100"], 0.5, rtol=1e-9)


def test_iou_threshold_sweep():
    # IoU with GT = 0.5 exactly: counts at tau=0.5 only.
    gt = np.array([_box(0.0, 0.0, 0.2, 0.2)])
    pred = np.array([_box(0.0, 0.0, 0.2, 0.1)])  # IoU = 0.5
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": pred, "scores": np.array([0.9]),
          "labels": np.array([0])}],
        [{"boxes": gt, "labels": np.array([0])}],
    )
    r = m.compute()
    assert abs(r["map_50"] - 1.0) < 1e-9
    np.testing.assert_allclose(r["map"], 1.0 / 10, rtol=1e-6)  # 1 of 10 taus


def test_mar_maxdets():
    # 3 GT; 3 TP preds but mar_1 only counts the best-scoring one.
    boxes = np.array(
        [_box(0.0, 0.0, 0.1, 0.1), _box(0.3, 0.3, 0.4, 0.4),
         _box(0.6, 0.6, 0.7, 0.7)]
    )
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": boxes, "scores": np.array([0.9, 0.8, 0.7]),
          "labels": np.array([0, 0, 0])}],
        [{"boxes": boxes, "labels": np.array([0, 0, 0])}],
    )
    r = m.compute()
    np.testing.assert_allclose(r["mar_1"], 1 / 3, rtol=1e-9)
    np.testing.assert_allclose(r["mar_10"], 1.0, rtol=1e-9)


def test_multiclass_mean():
    # class 0 perfect, class 1 missed -> map = 0.5
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.array([_box(0.1, 0.1, 0.3, 0.3)]),
          "scores": np.array([0.9]), "labels": np.array([0])}],
        [{"boxes": np.array(
            [_box(0.1, 0.1, 0.3, 0.3), _box(0.5, 0.5, 0.7, 0.7)]),
          "labels": np.array([0, 1])}],
    )
    r = m.compute()
    np.testing.assert_allclose(r["map"], 0.5, rtol=1e-9)


def test_detections_to_map_inputs_filters():
    dets = np.array(
        [[[1, 0.9, 0.1, 0.1, 0.2, 0.2],
          [-1, 0.3, 0.0, 0.0, 0.1, 0.1]]]
    )
    labels = np.array([[[0, 0.1, 0.1, 0.2, 0.2], [-1, -1, -1, -1, -1]]])
    preds, targets = detections_to_map_inputs(dets, labels)
    assert len(preds[0]["boxes"]) == 1
    assert preds[0]["labels"][0] == 1
    assert len(targets[0]["boxes"]) == 1
    assert targets[0]["labels"][0] == 0


def test_reset():
    m = MeanAveragePrecision()
    m.update(
        [{"boxes": np.array([_box(0.1, 0.1, 0.3, 0.3)]),
          "scores": np.array([0.9]), "labels": np.array([0])}],
        [{"boxes": np.array([_box(0.1, 0.1, 0.3, 0.3)]),
          "labels": np.array([0])}],
    )
    m.reset()
    r = m.compute()
    assert r["map"] == 0.0


def test_merge_across_hosts():
    # two accumulators over disjoint shards == one over the union
    boxes = np.array([_box(0.1, 0.1, 0.3, 0.3)])
    shard = lambda: (
        [{"boxes": boxes, "scores": np.array([0.9]), "labels": np.array([0])}],
        [{"boxes": boxes, "labels": np.array([0])}],
    )
    miss = (
        [{"boxes": np.array([_box(0.7, 0.7, 0.9, 0.9)]),
          "scores": np.array([0.8]), "labels": np.array([0])}],
        [{"boxes": boxes, "labels": np.array([0])}],
    )
    a, b_acc, whole = (
        MeanAveragePrecision(), MeanAveragePrecision(), MeanAveragePrecision()
    )
    a.update(*shard())
    b_acc.update(*miss)
    whole.update(*shard())
    whole.update(*miss)
    a.merge(b_acc)
    ra, rw = a.compute(), whole.compute()
    for k in ra:
        np.testing.assert_allclose(ra[k], rw[k], rtol=1e-9)
