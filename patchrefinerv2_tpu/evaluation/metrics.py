"""Depth metrics (numpy, host-side) — estimator/utils/metric.py equivalents.

compute_errors (:11-51): a1/a2/a3, abs_rel, sq_rel, rmse, rmse_log, silog,
log_10 over flattened valid pixels. compute_metrics (:88-149): bilinear
(align_corners=False) interpolation of pred to gt shape, clamping, valid
mask, garg/eigen crops, and SEE (soft edge error, :54-86) on gt-edge pixels.
extract_edges (:169-207): canny over log/inverse depth.
"""

from __future__ import annotations

import numpy as np

from patchrefinerv2_tpu.ops.resize import resize_matrix


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> dict:
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25**2).mean()
    a3 = (thresh < 1.25**3).mean()
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    err = np.log(pred) - np.log(gt)
    silog = np.sqrt(np.mean(err**2) - np.mean(err) ** 2) * 100
    log_10 = np.abs(np.log10(gt) - np.log10(pred)).mean()
    return dict(
        a1=a1, a2=a2, a3=a3, abs_rel=abs_rel, rmse=rmse, log_10=log_10,
        rmse_log=rmse_log, silog=silog, sq_rel=sq_rel,
    )


def _resize_np(img: np.ndarray, size, mode="bilinear", align_corners=False):
    wh = resize_matrix(img.shape[0], size[0], mode, align_corners)
    ww = resize_matrix(img.shape[1], size[1], mode, align_corners)
    return wh @ img.astype(np.float64) @ ww.T


def shift_2d_replace(data, dx, dy, constant=0.0):
    shifted = np.roll(data, dx, axis=1)
    if dx < 0:
        shifted[:, dx:] = constant
    elif dx > 0:
        shifted[:, :dx] = constant
    shifted = np.roll(shifted, dy, axis=0)
    if dy < 0:
        shifted[dy:, :] = constant
    elif dy > 0:
        shifted[:dy, :] = constant
    return shifted


def soft_edge_error(pred, gt, radius=1):
    abs_diff = [
        np.abs(shift_2d_replace(gt, i, j, 0) - pred)
        for i in range(-radius, radius + 1)
        for j in range(-radius, radius + 1)
    ]
    return np.minimum.reduce(abs_diff)


def get_boundaries(disp, th=1.0, dilation=10):
    import cv2

    edges_y = np.logical_or(
        np.pad(np.abs(disp[1:, :] - disp[:-1, :]) > th, ((1, 0), (0, 0))),
        np.pad(np.abs(disp[:-1, :] - disp[1:, :]) > th, ((0, 1), (0, 0))),
    )
    edges_x = np.logical_or(
        np.pad(np.abs(disp[:, 1:] - disp[:, :-1]) > th, ((0, 0), (1, 0))),
        np.pad(np.abs(disp[:, :-1] - disp[:, 1:]) > th, ((0, 0), (0, 1))),
    )
    edges = np.logical_or(edges_y, edges_x).astype(np.float32)
    if dilation > 0:
        kernel = np.ones((dilation, dilation), np.uint8)
        edges = cv2.dilate(edges, kernel, iterations=1)
    return edges


def _canny_numpy(image, sigma=1.0, low_threshold=0.1, high_threshold=0.2, mask=None):
    """skimage.feature.canny reimplementation on numpy/scipy (skimage is
    not in this environment): masked gaussian smoothing with bleed-over
    compensation, scipy sobel gradients, bilinear-interpolated non-maximum
    suppression in four orientation sectors, and connected-component
    hysteresis between the low/high magnitude thresholds (skimage default
    absolute thresholds 0.1/0.2)."""
    from scipy import ndimage as ndi

    image = np.asarray(image, np.float64)
    if mask is None:
        mask = np.ones(image.shape, bool)
    else:
        mask = np.asarray(mask, bool)
    fsmooth = lambda x: ndi.gaussian_filter(x, sigma, mode="constant")
    bleed = fsmooth(mask.astype(np.float64))
    smoothed = fsmooth(image * mask) / (bleed + 1e-12)
    eroded_mask = ndi.binary_erosion(mask, np.ones((3, 3), bool), border_value=0)

    jsobel = ndi.sobel(smoothed, axis=1)
    isobel = ndi.sobel(smoothed, axis=0)
    magnitude = np.hypot(isobel, jsobel)

    from patchrefinerv2_tpu.ops.canny import canny_nms

    local_maxima = canny_nms(np, isobel, jsobel, magnitude)
    local_maxima &= eroded_mask & (magnitude > 0)
    low_mask = local_maxima & (magnitude >= low_threshold)
    high_mask = local_maxima & (magnitude >= high_threshold)
    labels, num = ndi.label(low_mask, structure=np.ones((3, 3), int))
    if num == 0:
        return low_mask
    hits = ndi.sum(high_mask.astype(np.float64), labels, np.arange(1, num + 1))
    keep = np.zeros(num + 1, bool)
    keep[1:] = hits > 0
    return low_mask & keep[labels]


def extract_edges(depth, preprocess=None, sigma=1, mask=None, use_canny=True):
    """Canny edges over log/inverse depth (metric.py:169-207)."""
    try:
        from skimage.feature import canny
    except ImportError:
        canny = _canny_numpy

    depth = np.asarray(depth).squeeze()
    if preprocess == "log":
        depth = np.where(depth > 0, np.log(np.clip(depth, 1.19e-7, None)), 0.0)
    elif preprocess == "inv":
        disp = 1.0 / np.clip(depth, 1.19e-7, None)
        disp[depth == 0] = 0.0
        disp = disp / (disp.max() + 1.19e-7)
        depth = disp
    if use_canny:
        return canny(depth, sigma=sigma, mask=mask)
    raise NotImplementedError("only canny edge extraction is supported")


def compute_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    interpolate=True,
    garg_crop=False,
    eigen_crop=True,
    dataset="nyu",
    min_depth_eval=0.1,
    max_depth_eval=10,
    disp_gt_edges=None,
    additional_mask=None,
) -> dict:
    gt_depth = np.asarray(gt, np.float64).squeeze()
    pred = np.asarray(pred, np.float64).squeeze()
    if gt_depth.shape != pred.shape and interpolate:
        pred = _resize_np(pred, gt_depth.shape, "bilinear", align_corners=False)

    pred = pred.copy()
    pred[pred < min_depth_eval] = min_depth_eval
    pred[pred > max_depth_eval] = max_depth_eval
    pred[np.isinf(pred)] = max_depth_eval
    pred[np.isnan(pred)] = min_depth_eval

    valid_mask = np.logical_and(gt_depth > min_depth_eval, gt_depth < max_depth_eval)

    gt_h, gt_w = gt_depth.shape
    if garg_crop:
        eval_mask = np.zeros_like(valid_mask)
        eval_mask[
            int(0.40810811 * gt_h) : int(0.99189189 * gt_h),
            int(0.03594771 * gt_w) : int(0.96405229 * gt_w),
        ] = 1
    elif eigen_crop:
        eval_mask = np.zeros_like(valid_mask)
        if dataset == "kitti":
            eval_mask[
                int(0.3324324 * gt_h) : int(0.91351351 * gt_h),
                int(0.0359477 * gt_w) : int(0.96405229 * gt_w),
            ] = 1
        else:
            eval_mask[45:471, 41:601] = 1
    else:
        eval_mask = np.ones_like(valid_mask)
    valid_mask = np.logical_and(valid_mask, eval_mask)
    if additional_mask is not None:
        valid_mask = np.logical_and(valid_mask, np.asarray(additional_mask).squeeze())

    if valid_mask.sum() == 0:
        return {}
    metrics = compute_errors(gt_depth[valid_mask], pred[valid_mask])

    if disp_gt_edges is not None:
        edges = np.asarray(disp_gt_edges).squeeze().astype(bool)
        mask = np.logical_and(valid_mask, edges)
        see = 0.0
        if mask.sum() > 0:
            see_map = soft_edge_error(pred, gt_depth)
            see = float(see_map[mask].mean())
        metrics["see"] = see
    return metrics


def _gaussian_extend(edges: np.ndarray, ksize=5, sigma=5.0) -> np.ndarray:
    """Dilate an edge mask with a gaussian blur > 0 (metric.py:252-265)."""
    from patchrefinerv2_tpu.ops.masks import _gaussian_blur

    blurred = _gaussian_blur(edges.astype(np.float64), ksize, sigma)
    return blurred > 0


def compute_boundary_metrics(
    gt,
    pred,
    gt_edges,
    valid_mask,
    pred_edges,
    th_edges_acc=10,
    th_edges_comp=10,
) -> dict:
    """EdgeAcc/EdgeComp via distance transforms + P/R/F1 on gaussian-extended
    edge masks (metric.py:210-272; torchmetrics binary P/R/F1 replaced with
    the closed-form counts)."""
    from scipy import ndimage

    valid_mask = np.asarray(valid_mask, bool)
    gt_edges = np.asarray(gt_edges, bool)
    pred_edges = np.asarray(pred_edges, bool)
    gt_edges_orig = gt_edges.copy()
    pred_edges_orig = pred_edges.copy()
    invalid = ~valid_mask

    D_target = ndimage.distance_transform_edt(~gt_edges)
    D_pred = ndimage.distance_transform_edt(~pred_edges)
    gt_edges = gt_edges.copy()
    pred_edges = pred_edges.copy()
    gt_edges[invalid] = 0
    pred_edges[invalid] = 0

    pred_close = pred_edges & (D_target < th_edges_acc)
    metrics = {
        "EdgeAcc": float(D_target[pred_close].mean()) if pred_close.sum() else float(th_edges_acc),
        "EdgeComp": float(D_pred[gt_edges].mean()) if pred_close.sum() else float(th_edges_comp),
    }

    gt_ext = _gaussian_extend(gt_edges_orig)[valid_mask].reshape(-1)
    pred_ext = _gaussian_extend(pred_edges_orig)[valid_mask].reshape(-1)
    tp = float(np.logical_and(pred_ext, gt_ext).sum())
    fp = float(np.logical_and(pred_ext, ~gt_ext).sum())
    fn = float(np.logical_and(~pred_ext, gt_ext).sum())
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
    metrics.update({"precision": precision, "recall": recall, "f1": f1})
    return metrics
