"""Deliberately literal, loopy port of pycocotools' COCOeval semantics
(bbox iouType, area range "all", no crowd / ignore flags), used ONLY as
a differential-testing oracle for
``snn_for_object_detection_tpu.train.metrics.MeanAveragePrecision``.

Structure intentionally mirrors pycocotools' ``COCOeval.evaluateImg``
and ``COCOeval.accumulate`` (per-image/per-class greedy matching with
in-order strict-improvement gt scanning; global mergesort by score;
backward precision envelope; 101-point searchsorted interpolation;
-1 sentinel for classes with no ground truth) — nothing here is shared
with the production implementation, which is vectorized and
prefix-sliced.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)


def _iou(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Plain double loop, corner boxes."""
    out = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        da = max(d[2] - d[0], 0) * max(d[3] - d[1], 0)
        for j, g in enumerate(gt):
            ga = max(g[2] - g[0], 0) * max(g[3] - g[1], 0)
            iw = min(d[2], g[2]) - max(d[0], g[0])
            ih = min(d[3], g[3]) - max(d[1], g[1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            out[i, j] = inter / (da + ga - inter)
    return out


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, max_det):
    """COCOeval.evaluateImg for one (image, class): returns (dtm bool
    [T, D], dt_scores sorted, n_gt) with D = min(len(dt), max_det)."""
    dtind = np.argsort(-dt_scores, kind="mergesort")
    dt_boxes = dt_boxes[dtind][:max_det]
    dt_scores = dt_scores[dtind][:max_det]
    ious = _iou(dt_boxes, gt_boxes)
    T = len(IOU_THRS)
    D = len(dt_boxes)
    G = len(gt_boxes)
    gtm = np.zeros((T, G), dtype=np.int64)
    dtm = np.zeros((T, D), dtype=bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            # start threshold a hair below t (pycocotools' min(t,1-1e-10))
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0:
                    continue
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtm[tind, dind] = True
            gtm[tind, m] = dind + 1
    return dtm, dt_scores, G


def cocoeval_oracle(preds, targets):
    """Full evaluate + accumulate + summarize for lists of per-image
    dicts (same input schema as the production metric).

    Returns the same keys: map, map_50, mar_1, mar_10, mar_100.
    """
    cat_ids = sorted(
        {int(c) for t in targets for c in np.asarray(t["labels"]).tolist()}
    )
    T = len(IOU_THRS)
    K = len(cat_ids)
    M = len(MAX_DETS)
    precision = -np.ones((T, len(REC_THRS), K, M))
    recall = -np.ones((T, K, M))

    for k, cat in enumerate(cat_ids):
        # per-image matching at the largest maxDet... pycocotools
        # actually matches at each maxDet independently; do it literally.
        for m, max_det in enumerate(MAX_DETS):
            img_results = []
            for p, t in zip(preds, targets):
                psel = np.asarray(p["labels"]) == cat
                tsel = np.asarray(t["labels"]) == cat
                dtm, scores, G = _evaluate_img(
                    np.asarray(p["boxes"], dtype=np.float64)[psel],
                    np.asarray(p["scores"], dtype=np.float64)[psel],
                    np.asarray(t["boxes"], dtype=np.float64)[tsel],
                    max_det,
                )
                img_results.append((dtm, scores, G))
            npig = sum(G for _, _, G in img_results)
            if npig == 0:
                continue
            dt_scores = np.concatenate([s for _, s, _ in img_results])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([d for d, _, _ in img_results], axis=1)[
                :, inds
            ]
            tps = dtm
            fps = ~dtm
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for t in range(T):
                tp = tp_sum[t]
                fp = fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros((len(REC_THRS),))
                if nd:
                    recall[t, k, m] = rc[-1]
                else:
                    recall[t, k, m] = 0
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds_r = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds_r):
                    try:
                        q[ri] = pr[pi]
                    except IndexError:
                        pass
                precision[t, :, k, m] = np.array(q)

    def _summarize(arr):
        arr = arr[arr > -1]
        return float(np.mean(arr)) if arr.size else 0.0

    # maxDets=100 column for AP (pycocotools default)
    return {
        "map": _summarize(precision[:, :, :, MAX_DETS.index(100)]),
        "map_50": _summarize(precision[0, :, :, MAX_DETS.index(100)]),
        "mar_1": _summarize(recall[:, :, 0]),
        "mar_10": _summarize(recall[:, :, 1]),
        "mar_100": _summarize(recall[:, :, 2]),
    }
