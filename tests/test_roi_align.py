"""Golden tests for roi_align against a numpy port of the torchvision CPU
algorithm (aligned=True), written independently from the JAX kernel
(shared golden in tests/_roi_align_np.py)."""

import numpy as np
import pytest

from patchrefinerv2_tpu.ops.roi_align import roi_align
from tests._roi_align_np import roi_align_np


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
