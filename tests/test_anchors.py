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


def test_kmeans_1d_recovers_clusters():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(0.1, 0.005, 200),
        rng.normal(0.4, 0.005, 200),
        rng.normal(0.8, 0.005, 200),
    ])
    centers = anchor_ops.kmeans_1d(vals, 3)
    np.testing.assert_allclose(centers, [0.1, 0.4, 0.8], atol=0.01)
    assert centers.dtype == np.float32


def test_calc_anchor_params_inverts_generator_math():
    """Boxes generated FROM known (size, ratio) pairs must k-means back
    to those parameters (the generator's aspect corrections cancel in
    the size estimate; ratio needs the feat-aspect factor)."""
    feat_aspect = 304 / 240  # W/H, constant across pyramid scales
    true_sizes = np.array([0.1, 0.2, 0.3, 0.45, 0.6, 0.75])
    true_ratios = np.array([0.5, 1.0, 2.0])
    rng = np.random.default_rng(1)
    wh = []
    for s in true_sizes:
        for r in true_ratios:
            # generator box math (anchors.py:64-73) up to jitter
            w = s * r / feat_aspect
            h = s / r * feat_aspect
            n = 100
            wh.append(np.stack([
                w * rng.normal(1.0, 0.01, n), h * rng.normal(1.0, 0.01, n)
            ], axis=1))
    wh = np.concatenate(wh)
    sizes, ratios = anchor_ops.calc_anchor_params(
        wh, num_scales=2, size_per_pix=3, num_ratios=3,
        feat_aspect=feat_aspect,
    )
    assert sizes.shape == (2, 3)
    np.testing.assert_allclose(sizes.ravel(), true_sizes, rtol=0.08)
    np.testing.assert_allclose(ratios, true_ratios, rtol=0.08)


def test_calc_anchor_params_rejects_empty():
    import pytest

    with pytest.raises(ValueError):
        anchor_ops.calc_anchor_params(np.zeros((4, 2)), 2)


def test_calc_anchors_script(tmp_path):
    """scripts/calc_anchors.py end-to-end over the synthetic dataset."""
    import subprocess
    import sys

    from snn_for_object_detection_tpu.data.synthetic import (
        make_synthetic_dataset,
    )

    root = make_synthetic_dataset(str(tmp_path), records_per_split=2,
                                  duration_ms=1200)
    out = subprocess.run(
        [sys.executable, "scripts/calc_anchors.py", "--data_dir", root,
         "--dataset", "gen1"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "anchor_sizes:" in out.stdout
    assert "anchor_ratios:" in out.stdout
