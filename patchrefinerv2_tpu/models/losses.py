"""Loss modules (pure JAX, registered under the reference config type names).

Numerics match estimator/models/losses.py:
* SILogLoss (:21-67): masked scale-invariant log loss. The reference
  flattens all valid pixels of the batch before var/mean (torch.var is
  unbiased, N-1); replicated with masked moments so shapes stay static.
* GradMatchLoss (:943-984): stride-2 gradient-of-difference L1.
* EALoss (:987-1042): coarse-error-weighted SILog.
* ScaleAndShiftInvariantDALoss (:547-598): mean/std alignment + grad match.
* ScaleAndShiftInvariantLoss (:600-700): closed-form scale/shift (lstsq)
  alignment, optional gradient-domain 'inverse' variant. The
  only_missing_area canny-mask path runs IN-GRAPH here
  (missing_area_sampling_mask: canny_edges_graph + kornia-style blur),
  where the reference detours per-image to CPU (losses.py:668-670).

All losses take NHWC (B, H, W, 1) predictions/targets; masks are boolean.
The reference's "mask too small -> return 0" guards (:45-47) become
branchless ``where`` selects on the traced mask count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.ops.resize import resize


def _align_pred(pred, target):
    if pred.shape[1:3] != target.shape[1:3]:
        pred = resize(pred, target.shape[1:3], mode="bilinear", align_corners=True)
    return pred


def _masked_mean(x, m, n):
    return jnp.sum(x * m) / jnp.maximum(n, 1.0)


def _merge_additional_mask(mask, additional_mask, h, w):
    """losses.py:38-43: use merged mask only if it keeps >= 0.1% pixels."""
    if additional_mask is None:
        return mask
    merged = jnp.logical_and(mask, additional_mask)
    big_enough = jnp.sum(merged) >= h * w * 0.001
    return jnp.where(big_enough, merged, mask)


@MODELS.register_module()
class SILogLoss:
    def __init__(self, beta: float = 0.15, **kwargs):
        self.beta = beta
        self.name = "SILog"

    def __call__(self, pred, target, min_depth, max_depth, additional_mask=None):
        pred = _align_pred(pred, target)
        b, h, w, _ = pred.shape
        mask = jnp.logical_and(target > min_depth, target < max_depth)
        mask = _merge_additional_mask(mask, additional_mask, h, w)
        m = mask.astype(jnp.float32)
        n = jnp.sum(m)
        alpha = 1e-7
        g = jnp.log(jnp.maximum(pred, 0.0) + alpha) - jnp.log(target + alpha)
        g = jnp.where(mask, g, 0.0)
        mean = jnp.sum(g) / jnp.maximum(n, 1.0)
        var = jnp.sum(jnp.where(mask, (g - mean) ** 2, 0.0)) / jnp.maximum(n - 1.0, 1.0)
        Dg = var + self.beta * mean**2
        loss = 10.0 * jnp.sqrt(jnp.maximum(Dg, 1e-12))
        return jnp.where(n > 1, loss, 0.0)


def _grad_match(d_diff, m):
    """Shared stride-2 masked gradient term (losses.py:973-983)."""
    n = jnp.sum(m)
    d = d_diff * m
    v = jnp.abs(d[:, :-2, :, :] - d[:, 2:, :, :]) * (m[:, :-2] * m[:, 2:])
    h = jnp.abs(d[:, :, :-2, :] - d[:, :, 2:, :]) * (m[:, :, :-2] * m[:, :, 2:])
    return (jnp.sum(v) + jnp.sum(h)) / jnp.maximum(n, 1.0), n


@MODELS.register_module()
class GradMatchLoss:
    def __init__(self, **kwargs):
        self.name = "GMLoss"

    def __call__(self, pred, target, min_depth, max_depth, additional_mask=None):
        pred = _align_pred(pred, target)
        b, h, w, _ = pred.shape
        mask = jnp.logical_and(target > min_depth, target < max_depth)
        mask = _merge_additional_mask(mask, additional_mask, h, w)
        m = mask.astype(jnp.float32)
        # Reference QUIRK (losses.py:973-979): unlike the SSI family,
        # GradMatchLoss receives the UNsqueezed (B,1,H,W) tensors, so its
        # "v_gradient" term slices the size-1 CHANNEL axis (0:-2 of a
        # length-1 dim = empty) and contributes NOTHING — only the H-axis
        # gradient survives. Replicated exactly; caught and pinned by the
        # composed train-loss parity test against the imported reference
        # code (tests/test_reference_composed_parity.py), which measured
        # the two-axis version at ~2x the reference value.
        n = jnp.sum(m)
        d = (pred - target) * m
        v = jnp.abs(d[:, :-2, :, :] - d[:, 2:, :, :]) * (m[:, :-2] * m[:, 2:])
        loss = jnp.sum(v) / jnp.maximum(n, 1.0)
        return jnp.where(n > 1, loss, 0.0)


@MODELS.register_module()
class EALoss:
    """Coarse-error-weighted SILog (losses.py:987-1042)."""

    def __init__(self, beta: float = 0.15, **kwargs):
        self.beta = beta

    def __call__(self, pred, target, coarse, min_depth, max_depth, additional_mask=None):
        pred = _align_pred(pred, target)
        coarse = _align_pred(coarse, target)
        b, h, w, _ = pred.shape
        mask = jnp.logical_and(target > min_depth, target < max_depth)
        mask = _merge_additional_mask(mask, additional_mask, h, w)
        m = mask.astype(jnp.float32)
        n = jnp.sum(m)
        alpha = 1e-7
        g_c = jnp.log(jnp.maximum(coarse, 0.0) + alpha) - jnp.log(target + alpha)
        coarse_err = g_c**2
        g_f = (jnp.log(jnp.maximum(pred, 0.0) + alpha) - jnp.log(target + alpha)) * coarse_err
        g_f = jnp.where(mask, g_f, 0.0)
        mean = jnp.sum(g_f) / jnp.maximum(n, 1.0)
        var = jnp.sum(jnp.where(mask, (g_f - mean) ** 2, 0.0)) / jnp.maximum(n - 1.0, 1.0)
        loss = 10.0 * jnp.sqrt(jnp.maximum(var + self.beta * mean**2, 1e-12))
        return jnp.where(n > 1, loss, 0.0)


def missing_area_sampling_mask(gt_depth, pseudo, min_depth, max_depth):
    """In-graph port of the reference's only_missing_area sampling mask
    (losses.py:657-678 and the identical block in the uncert loss
    :733-752): pixels that are (a) valid gt, (b) inside a blurred gt==0
    "missing" halo, and (c) near a canny edge of the log pseudo-label.
    The reference detours per-image to CPU for the canny (extract_edges)
    and kornia-blurs on device; here both stay inside the jitted program
    (canny_edges_graph shares its NMS with the eval-time _canny_numpy via
    ops/canny.py). ``gt_depth``: (B, H, W[, 1]); ``pseudo``: (B, H, W).
    Returns a float32 (B, H, W) mask."""
    from patchrefinerv2_tpu.models.losses_extra import (
        _conv2d_same,
        canny_edges_graph,
    )

    gt = gt_depth[..., 0] if gt_depth.ndim == 4 else gt_depth
    # kornia.gaussian_blur2d(kernel=7x7, sigma=5, reflect)
    t7 = jnp.arange(7, dtype=jnp.float32) - 3.0
    g1 = jnp.exp(-0.5 * (t7 / 5.0) ** 2)
    g1 = g1 / g1.sum()
    blur_k = g1[:, None] * g1[None, :]
    blur = lambda z: _conv2d_same(z, blur_k, "reflect")
    missing_ext = blur((gt == 0.0).astype(jnp.float32)) > 0
    valid = (gt > min_depth) & (gt < max_depth)
    # extract_edges(pseudo_label, preprocess='log') semantics
    log_t = jnp.where(pseudo > 0, jnp.log(jnp.clip(pseudo, 1.19e-7, None)), 0.0)
    edges = canny_edges_graph(log_t)
    edges_ext = blur(edges.astype(jnp.float32)) > 0
    return (valid & missing_ext & edges_ext).astype(jnp.float32)


def compute_scale_and_shift(prediction, target, mask):
    """Per-image closed-form lstsq (losses.py:523-544). Inputs (B, H, W)."""
    a_00 = jnp.sum(mask * prediction * prediction, (1, 2))
    a_01 = jnp.sum(mask * prediction, (1, 2))
    a_11 = jnp.sum(mask, (1, 2))
    b_0 = jnp.sum(mask * prediction * target, (1, 2))
    b_1 = jnp.sum(mask * target, (1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


@MODELS.register_module()
class ScaleAndShiftInvariantDALoss:
    """SSI by mean/std alignment + optional grad matching (losses.py:547-598)."""

    def __init__(self, grad_matching: bool = True, **kwargs):
        self.grad_matching = grad_matching

    def __call__(self, pred, target, gt_depth=None, mask=None, min_depth=None, max_depth=None, **kw):
        pred = _align_pred(pred, target)
        p = pred[..., 0]
        t = target[..., 0]
        m = mask[..., 0].astype(jnp.float32) if mask.ndim == 4 else mask.astype(jnp.float32)
        n = jnp.sum(m)
        nn = jnp.maximum(n, 1.0)
        mu_p = jnp.sum(p * m) / nn
        mu_t = jnp.sum(t * m) / nn
        # torch.std over masked flatten is unbiased (N-1)
        sd_p = jnp.sqrt(jnp.sum(jnp.where(m > 0, (p - mu_p) ** 2, 0.0)) / jnp.maximum(n - 1.0, 1.0))
        sd_t = jnp.sqrt(jnp.sum(jnp.where(m > 0, (t - mu_t) ** 2, 0.0)) / jnp.maximum(n - 1.0, 1.0))
        sp = (p - mu_p) / jnp.maximum(sd_p, 1e-8)
        st = (t - mu_t) / jnp.maximum(sd_t, 1e-8)
        if self.grad_matching:
            loss, _ = _grad_match((sp - st)[..., None], m[..., None])
        else:
            loss = jnp.sum(jnp.abs(sp - st) * m) / nn
        return jnp.where(n > 1, loss, 0.0)


@MODELS.register_module()
class ScaleAndShiftInvariantLoss:
    """Closed-form SSI loss (losses.py:600-700), inverse = gradient domain."""

    def __init__(self, ssi=True, only_missing_area=False, grad_matching=False, inverse=False, **kw):
        self.ssi = ssi
        self.only_missing_area = only_missing_area
        self.grad_matching = grad_matching
        self.inverse = inverse

    def __call__(self, pred, pseudo_label, gt_depth=None, mask=None, min_depth=None, max_depth=None, **kw):
        pred = _align_pred(pred, pseudo_label)
        p = pred[..., 0]
        t = pseudo_label[..., 0]
        m = (mask[..., 0] if mask.ndim == 4 else mask).astype(jnp.float32)
        n = jnp.sum(m)

        if self.inverse:
            v_p = p[:, :-2, :] - p[:, 2:, :]
            v_t = t[:, :-2, :] - t[:, 2:, :]
            v_m = m[:, :-2, :] * m[:, 2:, :]
            h_p = p[:, :, :-2] - p[:, :, 2:]
            h_t = t[:, :, :-2] - t[:, :, 2:]
            h_m = m[:, :, :-2] * m[:, :, 2:]
            s, sh = compute_scale_and_shift(v_p, v_t, v_m)
            sv = s[:, None, None] * v_p + sh[:, None, None]
            s, sh = compute_scale_and_shift(h_p, h_t, h_m)
            shp = s[:, None, None] * h_p + sh[:, None, None]
            loss = (jnp.sum(jnp.abs(sv - v_t) * v_m) + jnp.sum(jnp.abs(shp - h_t) * h_m)) / jnp.maximum(n, 1.0)
            return jnp.where(n > 1, loss, 0.0)

        if self.ssi:
            scale, shift = compute_scale_and_shift(p, t, m)
            p = scale[:, None, None] * p + shift[:, None, None]

        if self.only_missing_area:
            m = missing_area_sampling_mask(gt_depth, t, min_depth, max_depth)
            n = jnp.sum(m)

        if self.grad_matching:
            loss, _ = _grad_match((p - t)[..., None], m[..., None])
        else:
            loss = jnp.sum(jnp.abs(p - t) * m) / jnp.maximum(n, 1.0)
        return jnp.where(n > 1, loss, 0.0)
