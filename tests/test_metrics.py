"""Golden tests for the evaluation metrics (utils/metric.py parity:
compute_errors :11-51, compute_metrics masks/crops :88-149, SEE :136-147,
get_boundaries :75-86, boundary EdgeAcc/EdgeComp/P/R/F1 :210-272)."""

import numpy as np

from patchrefinerv2_tpu.evaluation.metrics import (
    compute_boundary_metrics,
    compute_errors,
    compute_metrics,
    get_boundaries,
    soft_edge_error,
)


def test_compute_errors_known_values():
    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.0, 2.0, 4.0])
    m = compute_errors(gt, pred)
    assert m["a1"] == m["a2"] == m["a3"] == 1.0
    for k in ("abs_rel", "rmse", "rmse_log", "silog", "sq_rel", "log_10"):
        assert abs(m[k]) < 1e-12, k

    pred = gt * 1.3  # uniformly 30% off
    m = compute_errors(gt, pred)
    assert m["a1"] == 0.0 and m["a2"] == 1.0  # 1.3 > 1.25, < 1.5625
    np.testing.assert_allclose(m["abs_rel"], 0.3, atol=1e-12)
    # uniform log offset -> silog (the variance term) is zero
    np.testing.assert_allclose(m["silog"], 0.0, atol=1e-9)
    np.testing.assert_allclose(m["log_10"], np.log10(1.3), atol=1e-12)


def test_compute_metrics_clamping_and_valid_mask():
    gt = np.full((40, 50), 5.0)
    gt[:10] = 0.0  # invalid (below min) — excluded
    pred = np.full((40, 50), 5.0)
    pred[-1, -1] = np.inf  # clamped to max_depth_eval
    pred[0, 0] = np.nan  # in the invalid region anyway
    m = compute_metrics(
        gt, pred, garg_crop=False, eigen_crop=False,
        min_depth_eval=0.1, max_depth_eval=80,
    )
    # only the inf pixel contributes error after clamping to 80
    n_valid = 30 * 50
    expected_abs_rel = (80 - 5) / 5 / n_valid
    np.testing.assert_allclose(m["abs_rel"], expected_abs_rel, rtol=1e-9)


def test_compute_metrics_garg_crop_region():
    gt = np.full((100, 100), 2.0)
    pred = np.full((100, 100), 2.0)
    # corrupt only pixels OUTSIDE the garg crop -> metrics stay perfect
    pred[:40, :] = 10.0
    pred[:, :3] = 10.0
    m = compute_metrics(
        gt, pred, garg_crop=True, eigen_crop=False,
        min_depth_eval=0.1, max_depth_eval=80,
    )
    assert m["abs_rel"] == 0.0 and m["a1"] == 1.0


def test_see_only_on_edge_pixels():
    gt = np.ones((30, 40)) * 4.0
    gt[:, 20:] = 8.0  # a depth step edge at column 20
    pred = gt.copy()
    edges = np.zeros_like(gt, bool)
    edges[:, 19:21] = True
    m = compute_metrics(
        gt, pred, garg_crop=False, eigen_crop=False,
        min_depth_eval=0.1, max_depth_eval=80, disp_gt_edges=edges,
    )
    assert "see" in m
    # perfect prediction: soft edge error 0 (min over the shift window)
    np.testing.assert_allclose(m["see"], 0.0, atol=1e-12)
    # a shifted edge within the radius still scores ~0 at the edge pixels
    pred2 = np.ones_like(gt) * 4.0
    pred2[:, 21:] = 8.0
    see = soft_edge_error(pred2, gt)
    assert see[:, 19:21].mean() < 1e-9


def test_get_boundaries_marks_disparity_jumps():
    disp = np.zeros((20, 20), np.float32)
    disp[:, 10:] = 5.0
    b = get_boundaries(disp, th=1.0, dilation=0)
    assert b.shape == disp.shape
    # the jump column is marked, flat regions are not
    assert b[:, 9:11].any()
    assert not b[:, :5].any() and not b[:, 15:].any()


def test_boundary_metrics_perfect_and_shifted():
    gt = np.ones((64, 64))
    gt_edges = np.zeros((64, 64), bool)
    gt_edges[:, 32] = True
    valid = np.ones((64, 64), bool)
    m = compute_boundary_metrics(gt, gt, gt_edges, valid, gt_edges.copy())
    assert m["EdgeAcc"] == 0.0 and m["EdgeComp"] == 0.0
    assert m["f1"] > 0.99

    pred_edges = np.zeros_like(gt_edges)
    pred_edges[:, 35] = True  # 3 px off
    m2 = compute_boundary_metrics(gt, gt, gt_edges, valid, pred_edges)
    np.testing.assert_allclose(m2["EdgeAcc"], 3.0, atol=1e-6)
    np.testing.assert_allclose(m2["EdgeComp"], 3.0, atol=1e-6)
    assert m2["f1"] < m["f1"]
