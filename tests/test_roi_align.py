"""Golden tests for roi_align against a numpy port of the torchvision CPU
algorithm (aligned=True), written independently from the JAX kernel."""

import numpy as np
import pytest

from patchrefinerv2_tpu.ops.roi_align import roi_align


def _bilinear_np(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * feat[y0, x0]
        + hy * lx * feat[y0, x1]
        + ly * hx * feat[y1, x0]
        + ly * lx * feat[y1, x1]
    )


def roi_align_np(feats, boxes, idxs, out_size, scale, sampling_ratio=None):
    """torchvision semantics, aligned=True; sampling_ratio None = adaptive."""
    out_h, out_w = out_size
    n = boxes.shape[0]
    c = feats.shape[-1]
    out = np.zeros((n, out_h, out_w, c), np.float64)
    for r in range(n):
        feat = feats[idxs[r]].astype(np.float64)
        x1, y1, x2, y2 = boxes[r] * scale - 0.5
        roi_h, roi_w = y2 - y1, x2 - x1
        bin_h, bin_w = roi_h / out_h, roi_w / out_w
        gh = sampling_ratio or max(int(np.ceil(roi_h / out_h)), 1)
        gw = sampling_ratio or max(int(np.ceil(roi_w / out_w)), 1)
        for ph in range(out_h):
            for pw in range(out_w):
                acc = np.zeros(c, np.float64)
                for iy in range(gh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += _bilinear_np(feat, yy, xx)
                out[r, ph, pw] = acc / (gh * gw)
    return out.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_boxes_match_numpy_golden(seed):
    rng = np.random.RandomState(seed)
    feats = rng.randn(2, 12, 16, 5).astype(np.float32)
    # boxes in "process" coords with feature scale h_feat/384 (reference setup)
    scale = 12 / 384.0
    boxes = []
    for _ in range(6):
        x1 = rng.uniform(0, 300)
        y1 = rng.uniform(0, 200)
        boxes.append([x1, y1, x1 + rng.uniform(30, 210), y1 + rng.uniform(30, 180)])
    boxes = np.array(boxes, np.float32)
    idxs = rng.randint(0, 2, size=6).astype(np.int32)

    ref = roi_align_np(feats, boxes, idxs, (12, 16), scale)
    got = np.asarray(roi_align(feats, boxes, idxs, (12, 16), scale, sampling_ratio=1))
    # adaptive ratio is 1 for all these rois (roi <= feature size)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_reference_call_site_geometry():
    """Exact geometry of coarse_postprocess (patchrefinerplus.py:263-276):
    out_size == feature size, spatial_scale = h_feat / patch_process_h,
    boxes are patch bboxes pre-normalized to process coords."""
    rng = np.random.RandomState(3)
    h_feat, w_feat = 24, 32
    feats = rng.randn(1, h_feat, w_feat, 8).astype(np.float32)
    scale = h_feat / 384.0
    # 2x2 regular split of a 2160x3840 image normalized to 384x512 coords
    boxes = []
    for hs in (0, 1080):
        for ws in (0, 1920):
            boxes.append(
                [
                    ws * 512 / 3840,
                    hs * 384 / 2160,
                    (ws + 1920) * 512 / 3840,
                    (hs + 1080) * 384 / 2160,
                ]
            )
    boxes = np.array(boxes, np.float32)
    idxs = np.zeros(4, np.int32)
    ref = roi_align_np(feats, boxes, idxs, (h_feat, w_feat), scale)
    got = np.asarray(roi_align(feats, boxes, idxs, (h_feat, w_feat), scale))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sampling_ratio_2():
    rng = np.random.RandomState(4)
    feats = rng.randn(1, 8, 8, 3).astype(np.float32)
    boxes = np.array([[0.5, 0.5, 7.5, 6.5]], np.float32)
    idxs = np.zeros(1, np.int32)
    ref = roi_align_np(feats, boxes, idxs, (4, 4), 1.0, sampling_ratio=2)
    got = np.asarray(roi_align(feats, boxes, idxs, (4, 4), 1.0, sampling_ratio=2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mxu_path_matches_gather_path():
    from patchrefinerv2_tpu.ops.roi_align import roi_align_gather, roi_align_mxu

    rng = np.random.RandomState(7)
    feats = rng.randn(3, 20, 28, 6).astype(np.float32)
    boxes = []
    for _ in range(10):
        x1 = rng.uniform(-5, 400)
        y1 = rng.uniform(-5, 300)
        boxes.append([x1, y1, x1 + rng.uniform(10, 300), y1 + rng.uniform(10, 200)])
    boxes = np.array(boxes, np.float32)
    idxs = rng.randint(0, 3, size=10).astype(np.int32)
    scale = 20 / 384.0
    a = np.asarray(roi_align_gather(feats, boxes, idxs, (20, 28), scale, 1))
    b = np.asarray(roi_align_mxu(feats, boxes, idxs, (20, 28), scale, 1))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
