"""Numpy port of the torchvision CPU roi_align algorithm (aligned=True).

Shared golden: tests/test_roi_align.py pins the JAX kernel on it, and
tests/ref_shims.py serves it as the ``torchvision.ops.roi_align`` stand-in
so the actual reference model files run without torchvision
(/root/reference/estimator/models/patchrefinerplus.py:38,243-276).
"""

import numpy as np


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
