"""Anchor generation vs. a loopy numpy oracle of utils/anchors.py:46-85."""

import numpy as np

from snn_for_object_detection_tpu.ops import anchors as anchor_ops


def oracle_anchors(fh, fw, sizes, ratios):
    out = []
    w_list = np.concatenate([np.asarray(sizes) * r for r in ratios]) * fh / fw
    h_list = np.concatenate([np.asarray(sizes) / r for r in ratios]) * fw / fh
    for i in range(fh):
        for j in range(fw):
            cy = (i + 0.5) / fh
            cx = (j + 0.5) / fw
            for w, h in zip(w_list, h_list):
                out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    return np.asarray(out, dtype=np.float32)


def test_anchors_vs_oracle():
    sizes = np.array([0.08, 0.15, 0.23], np.float32)
    ratios = np.array([0.5, 1.0, 2.0], np.float32)
    got = anchor_ops.generate_anchors(5, 7, sizes, ratios)
    exp = oracle_anchors(5, 7, sizes, ratios)
    assert got.shape == (5 * 7 * 9, 4)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_anchor_centers():
    sizes = np.array([0.1], np.float32)
    ratios = np.array([1.0], np.float32)
    got = anchor_ops.generate_anchors(2, 2, sizes, ratios)
    centers = (got[:, :2] + got[:, 2:]) / 2
    exp = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]], np.float32
    )
    np.testing.assert_allclose(centers, exp, atol=1e-6)


def test_default_scale_sizes():
    sizes = anchor_ops.default_scale_sizes(3)
    # generator.py:390-396: arange(0.08, 0.75, 0.67/9) -> 9 values, (3, 3)
    assert sizes.shape == (3, 3)
    np.testing.assert_allclose(sizes[0, 0], 0.08, rtol=1e-6)
    np.testing.assert_allclose(
        sizes.flatten(),
        0.08 + np.arange(9) * (0.75 - 0.08) / 9,
        rtol=1e-5,
    )
