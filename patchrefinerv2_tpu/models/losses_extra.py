"""Edge / ranking / uncertainty / distillation losses.

Reference: estimator/models/losses.py. TPU-native redesigns where the
reference loss leaves the device:

* EdgeguidedRankingLoss (:256-520) — the reference extracts skimage canny
  edges on CPU per step and gathers a *dynamic* number of edge anchors.
  Here the canny anchor extraction runs in-graph (canny_edges_graph:
  NMS + bounded-iteration hysteresis, all VPU-vectorized) and anchors are
  drawn with ``jax.random.categorical`` over the edge mask (static sample
  count, invalid samples masked); the sampling geometry — incl. the
  kornia-sobel-magnitude-as-theta quirk and the two direction branches —
  mirrors the reference. Statistical parity (loss mean + seed-averaged
  gradient cosine vs a 1:1 torch port) is pinned by
  tests/test_ranking_loss_divergence.py.
* ScaleAndShiftInvariantUncertLoss (:703-779) — confidence-weighted grad
  matching; the only_missing_area canny path runs in-graph
  (losses.missing_area_sampling_mask).
* EdgeClsLoss (:183-204) / ErrorLoss (:207-243) — dice + focal over
  incoherence/grad-error masks (losses.py:97-156).
* BaseDistillLoss (:782-819), StructureDistillLoss (:845-941) with
  RandomBBoxQueries (utils/anchor_generation.py:4-37).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.models.losses import compute_scale_and_shift, _align_pred, _grad_match
from patchrefinerv2_tpu.ops.resize import resize


# --------------------------------------------------------------- edges
def sobel_edges(x):
    """Sobel magnitude + angle for (B, H, W) maps (in-graph substitute for
    getEdge/canny, losses.py:284-299)."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    gx = jax.lax.conv_general_dilated(
        xp[:, None], kx[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    gy = jax.lax.conv_general_dilated(
        xp[:, None], ky[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    mag = jnp.sqrt(gx**2 + gy**2)
    theta = jnp.arctan2(gy, gx)
    return mag, theta


def _conv2d_same(x, kern, mode):
    """Cross-correlate (B, H, W) with a 2D kernel; `mode` is the jnp.pad
    border mode ('constant' / 'symmetric' / 'edge')."""
    kh, kw = kern.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)), mode=mode)
    return jax.lax.conv_general_dilated(
        xp[:, None], kern[None, None].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]


def kornia_sobel_magnitude(x):
    """kornia.filters.sobel(x, normalized=True, eps=1e-6) on (B, H, W):
    the reference feeds this MAGNITUDE in as 'thetas' for the edge-guided
    sampling directions (losses.py:459) — a quirk preserved bit-for-bit."""
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
    ky = jnp.asarray([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]]) / 8.0
    gx = _conv2d_same(x, kx, "edge")
    gy = _conv2d_same(x, ky, "edge")
    return jnp.sqrt(gx * gx + gy * gy + 1e-6)


def _dilate3x3(m):
    """3x3 binary dilation of a (B, H, W) bool mask (zero border)."""
    b, h, w = m.shape
    mp = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
    out = jnp.zeros_like(m)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            out = out | mp[:, 1 + di : 1 + di + h, 1 + dj : 1 + dj + w]
    return out


def canny_edges_graph(x, sigma=1.0, low_threshold=0.1, high_threshold=0.2,
                      hysteresis_iters=128):
    """In-graph skimage-canny over (B, H, W) maps: gaussian smoothing with
    constant-pad bleed compensation, scipy-sobel gradients (reflect pad),
    bilinear-interpolated non-maximum suppression, and hysteresis via
    bounded 3x3-dilation iterations (a fixed-iteration-count stand-in for
    connected-component labelling — propagates `hysteresis_iters` px along
    weak-edge chains, exact for chains shorter than that).

    Matches evaluation.metrics._canny_numpy / skimage.feature.canny with a
    full mask; everything is vectorized VPU work so the whole loss stays
    inside one jitted program (vs the reference's per-step CPU round trip,
    losses.py:462-470)."""
    radius = max(1, int(4.0 * sigma + 0.5))
    t = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    g1 = jnp.exp(-0.5 * (t / sigma) ** 2)
    g1 = g1 / g1.sum()
    gauss2 = g1[:, None] * g1[None, :]

    bleed = _conv2d_same(jnp.ones_like(x), gauss2, "constant")
    smoothed = _conv2d_same(x, gauss2, "constant") / (bleed + 1e-12)

    deriv = jnp.asarray([-1.0, 0.0, 1.0])
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    jsobel = _conv2d_same(smoothed, smooth[:, None] * deriv[None, :], "symmetric")
    isobel = _conv2d_same(smoothed, deriv[:, None] * smooth[None, :], "symmetric")
    magnitude = jnp.hypot(isobel, jsobel)

    from patchrefinerv2_tpu.ops.canny import canny_nms

    local_maxima = canny_nms(jnp, isobel, jsobel, magnitude)

    interior = jnp.zeros(x.shape, bool).at[:, 1:-1, 1:-1].set(True)
    local_maxima = local_maxima & interior & (magnitude > 0)
    low_mask = local_maxima & (magnitude >= low_threshold)
    high_mask = local_maxima & (magnitude >= high_threshold)

    return jax.lax.fori_loop(
        0, hysteresis_iters,
        lambda _, m: low_mask & _dilate3x3(m),
        high_mask,
    )


@MODELS.register_module()
class EdgeguidedRankingLoss:
    def __init__(
        self,
        point_pairs=10000,
        sigma=0.03,
        alpha=1.0,
        reweight_target=False,
        only_missing_area=False,
        min_depth=1e-3,
        max_depth=80,
        missing_value=0,
        random_direct=True,
        edge_quantile=0.95,
        **kw,
    ):
        self.point_pairs = point_pairs
        self.sigma = sigma
        self.alpha = alpha
        self.reweight_target = reweight_target
        self.only_missing_area = only_missing_area
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.missing_value = missing_value
        self.random_direct = random_direct
        self.edge_quantile = edge_quantile

    def __call__(self, inputs, targets, images=None, depth_gt=None, rng=None):
        """inputs/targets/depth_gt: (B, H, W, 1). Returns (loss, sample_num)."""
        targets = _align_pred(targets, inputs)
        if depth_gt is None:
            depth_gt = targets
        depth_gt = _align_pred(depth_gt, inputs)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        b, h, w, _ = inputs.shape
        pred = inputs[..., 0]
        tgt = targets[..., 0]
        gt = depth_gt[..., 0]

        strict_mask = jnp.logical_and(gt > self.min_depth, gt < self.max_depth)
        if self.only_missing_area:
            anchor_region = gt == self.missing_value
        else:
            anchor_region = strict_mask

        # canny anchors over log target depth, exactly as the reference's
        # per-step CPU extract_edges(preprocess='log') (losses.py:462-470)
        # but computed in-graph
        log_t = jnp.where(tgt > 0, jnp.log(jnp.clip(tgt, 1.19e-7, None)), 0.0)
        edges = canny_edges_graph(log_t) & anchor_region
        # the reference's sampling 'thetas' are kornia sobel MAGNITUDES of
        # the raw target (losses.py:459) — preserved quirk
        theta = kornia_sobel_magnitude(tgt)

        n_s = self.point_pairs

        def per_image(key, pred_i, tgt_i, edge_i, theta_i, strict_i):
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            logits = jnp.where(edge_i.reshape(-1), 0.0, -1e30)
            any_edge = edge_i.any()
            anchor_idx = jax.random.categorical(k1, logits, shape=(n_s,))
            ah = anchor_idx // w
            aw = anchor_idx % w
            th = theta_i[ah, aw]
            dist = jax.random.randint(k3, (4, n_s), 2, 31).astype(jnp.float32)
            sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0])[:, None]
            dist = dist * sign
            # reference picks one of two direction conventions per image
            # (losses.py:334-342): p<0.5 uses (cos, sin); else theta+pi/2
            # wrapped to [-pi, pi) with (sin, cos) swapped
            col1 = aw[None] + jnp.round(dist * jnp.cos(th)[None]).astype(jnp.int32)
            row1 = ah[None] + jnp.round(dist * jnp.sin(th)[None]).astype(jnp.int32)
            th2 = jnp.mod(th + jnp.pi / 2 + jnp.pi, 2 * jnp.pi) - jnp.pi
            col2 = aw[None] + jnp.round(dist * jnp.sin(th2)[None]).astype(jnp.int32)
            row2 = ah[None] + jnp.round(dist * jnp.cos(th2)[None]).astype(jnp.int32)
            if self.random_direct:
                swap = jax.random.uniform(k2) >= 0.5
                col = jnp.where(swap, col2, col1)
                row = jnp.where(swap, row2, row1)
            else:
                col, row = col1, row1
            inb = (col >= 0) & (col <= w - 1) & (row >= 0) & (row <= h - 1)
            pair_ok = jnp.all(inb, axis=0) & any_edge
            colc = jnp.clip(col, 0, w - 1)
            rowc = jnp.clip(row, 0, h - 1)
            # pairs: (a,b), (b,c), (c,d)
            pa = pred_i[rowc, colc]  # (4, n_s)
            ta = tgt_i[rowc, colc]
            in_A = jnp.concatenate([pa[0], pa[1], pa[2]])
            in_B = jnp.concatenate([pa[1], pa[2], pa[3]])
            t_A = jnp.concatenate([ta[0], ta[1], ta[2]])
            t_B = jnp.concatenate([ta[1], ta[2], ta[3]])
            ok = jnp.concatenate([pair_ok, pair_ok, pair_ok]).astype(jnp.float32)

            # random pairs over the strict mask, one per surviving edge
            # pair (reference randomSampling gets sample_num = 3 * anchors,
            # losses.py:398-476) — weighted by the matching anchor's
            # survival so the edge:random ratio stays 1:1 in expectation
            slogits = jnp.where(strict_i.reshape(-1), 0.0, -1e30)
            any_valid = strict_i.any()
            ia = jax.random.categorical(k4, slogits, shape=(3 * n_s,))
            ib = jax.random.categorical(k5, slogits, shape=(3 * n_s,))
            in_A = jnp.concatenate([in_A, pred_i.reshape(-1)[ia]])
            in_B = jnp.concatenate([in_B, pred_i.reshape(-1)[ib]])
            t_A = jnp.concatenate([t_A, tgt_i.reshape(-1)[ia]])
            t_B = jnp.concatenate([t_B, tgt_i.reshape(-1)[ib]])
            ok_r = jnp.tile(pair_ok, 3) & any_valid
            ok = jnp.concatenate([ok, ok_r.astype(jnp.float32)])

            in_A = in_A / (250.0 / 80.0)
            in_B = in_B / (250.0 / 80.0)

            ratio = (t_A + 1e-6) / (t_B + 1e-6)
            weight = jnp.abs(t_A - t_B) / (jnp.max(jnp.abs(t_A - t_B)) + 1e-6)
            weight = jnp.exp(weight)
            mask_eq = (ratio < 1.0 + self.sigma) & (ratio > 1.0 / (1.0 + self.sigma))
            labels = jnp.where(ratio >= 1.0 + self.sigma, 1.0, 0.0)
            labels = jnp.where(ratio <= 1.0 / (1.0 + self.sigma), -1.0, labels)

            diff = in_A - in_B
            if self.reweight_target:
                equal = diff**2 / weight * mask_eq
                unequal = jnp.log1p(jnp.exp(jnp.clip((-diff / weight) * labels, -30, 30))) * (~mask_eq)
            else:
                equal = diff**2 * mask_eq
                unequal = jnp.log1p(jnp.exp(jnp.clip(-diff * labels, -30, 30))) * (~mask_eq)
            denom = jnp.maximum(ok.sum(), 1.0)
            li = self.alpha * jnp.sum(equal * ok) / denom + jnp.sum(unequal * ok) / denom
            return li, ok.sum()

        keys = jax.random.split(rng, b)
        losses, counts = jax.vmap(per_image)(keys, pred, tgt, edges, theta, strict_mask)
        return jnp.mean(losses), jnp.mean(counts)


@MODELS.register_module()
class ScaleAndShiftInvariantUncertLoss:
    """Confidence-weighted SSI loss (losses.py:703-779)."""

    def __init__(self, only_missing_area=False, grad_matching=True, **kw):
        self.grad_matching = grad_matching
        self.only_missing_area = only_missing_area

    def __call__(self, pred, pseudo_label, gt_depth, mask, min_depth, max_depth, uncert):
        pred = _align_pred(pred, pseudo_label)
        uncert = _align_pred(uncert, pseudo_label)
        p = pred[..., 0]
        t = pseudo_label[..., 0]
        m = (mask[..., 0] if mask.ndim == 4 else mask).astype(jnp.float32)
        u = uncert[..., 0]
        n = jnp.sum(m)
        scale, shift = compute_scale_and_shift(p, t, m)
        p = scale[:, None, None] * p + shift[:, None, None]
        if self.only_missing_area:
            # scale/shift above uses the FULL mask (reference order,
            # losses.py:730-733); only the loss aggregation restricts to
            # the missing-area sampling mask
            from patchrefinerv2_tpu.models.losses import missing_area_sampling_mask

            m = missing_area_sampling_mask(gt_depth, t, min_depth, max_depth)
            n = jnp.sum(m)
        conf = 1.0 - u
        if self.grad_matching:
            d = (p - t) * m
            v = jnp.abs(d[:, :-2, :] - d[:, 2:, :]) * (m[:, :-2] * m[:, 2:])
            v = v * ((conf[:, :-2] + conf[:, 2:]) / 2)
            hg = jnp.abs(d[:, :, :-2] - d[:, :, 2:]) * (m[:, :, :-2] * m[:, :, 2:])
            hg = hg * ((conf[:, :, :-2] + conf[:, :, 2:]) / 2)
            loss = (jnp.sum(v) + jnp.sum(hg)) / jnp.maximum(n, 1.0)
        else:
            loss = jnp.sum(jnp.abs(p - t) * m) / jnp.maximum(n, 1.0)
        return jnp.where(n > 1, loss, 0.0)


# ---------------------------------------------------- dice + focal masks
def _dice_loss(probs, labels, n_classes):
    """Multiclass soft dice over one-hot labels (kornia.losses.dice_loss)."""
    onehot = jax.nn.one_hot(labels, n_classes, axis=-1)
    dims = (1, 2)
    inter = jnp.sum(probs * onehot, dims)
    card = jnp.sum(probs + onehot, dims)
    dice = 2.0 * inter / (card + 1e-8)
    return jnp.mean(1.0 - dice)


def _focal_loss(probs, labels, alpha=0.5, gamma=2.0):
    """Multiclass focal loss over probabilities (kornia semantics)."""
    n_classes = probs.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes, axis=-1)
    logp = jnp.log(jnp.clip(probs, 1e-8, 1.0))
    focal = -alpha * (1.0 - probs) ** gamma * logp
    return jnp.mean(jnp.sum(onehot * focal, axis=-1))


def get_incoherent_mask(gt, shape, min_depth, max_depth):
    """Downsample-upsample residue labels (losses.py:97-111). gt NHWC."""
    ori = gt.shape[1:3]
    lr = resize(gt, shape, "bilinear", True)
    rec = resize(lr, ori, "bilinear", True)
    residue = jnp.abs(gt - rec)
    invalid = jnp.logical_or(gt <= min_depth, gt >= max_depth)
    label = jnp.zeros_like(gt)
    label = jnp.where(residue >= 0.01, 1.0, label)
    label = jnp.where(invalid, 2.0, label)
    label = jnp.where(gt > 10000, 3.0, label)
    return label[..., 0].astype(jnp.int32)


def _grad_map(v):
    """kornia spatial_gradient magnitude (losses.py:70-73), v NHWC."""
    mag, _ = sobel_edges(v[..., 0] / 8.0)  # kornia normalizes sobel by 8
    return mag[..., None]


def get_incoherent_grad_error_mask(gt, coarse, shape, min_depth, max_depth):
    """losses.py:113-135: incoherence OR relative grad error labels."""
    ori = gt.shape[1:3]
    lr = resize(gt, shape, "bilinear", True)
    rec = resize(lr, ori, "bilinear", True)
    residue = jnp.abs(gt - rec)
    grad_err = jnp.abs((_grad_map(gt) - _grad_map(coarse)) / gt)
    invalid = jnp.logical_or(gt <= min_depth, gt >= max_depth)
    label = jnp.zeros_like(gt)
    label = jnp.where(residue >= 0.01, 1.0, label)
    label = jnp.where(grad_err > 0.001, 1.0, label)
    label = jnp.where(invalid, 2.0, label)
    label = jnp.where(gt > 10000, 3.0, label)
    return label[..., 0].astype(jnp.int32)


def get_incoherent_grad_value_error_mask(gt, coarse, shape, min_depth, max_depth):
    """losses.py:85-95 value+grad error labels."""
    err = jnp.abs((gt - coarse) / gt)
    grad_err = jnp.abs((_grad_map(gt) - _grad_map(coarse)) / gt)
    invalid = jnp.logical_or(gt <= min_depth, gt >= max_depth)
    label = jnp.zeros_like(gt)
    label = jnp.where(err > 0.1, 1.0, label)
    label = jnp.where(grad_err > 0.001, 1.0, label)
    label = jnp.where(invalid, 2.0, label)
    label = jnp.where(gt > 10000, 3.0, label)
    return label[..., 0].astype(jnp.int32)


@MODELS.register_module()
class EdgeClsLoss:
    """Dice + focal edge classification (losses.py:183-204). input: class
    probabilities (B, H, W, C); target: int labels (B, H, W)."""

    def __init__(self, focal_weight=0.5, **kw):
        self.focal_weight = focal_weight

    def __call__(self, probs, target):
        if probs.shape[1:3] != target.shape[1:3]:
            probs = resize(probs, target.shape[1:3], "bilinear", True)
        n_classes = probs.shape[-1]
        labels = target.astype(jnp.int32)
        return _dice_loss(probs, labels, n_classes), _focal_loss(
            probs, labels, alpha=self.focal_weight
        )


@MODELS.register_module()
class ErrorLoss:
    """Dice + focal over derived error masks (losses.py:207-243)."""

    def __init__(self, loss_type="incoh+grad", focal_weight=0.5, **kw):
        self.loss_type = loss_type
        self.focal_weight = focal_weight

    def __call__(self, probs, target, coarse_prediction, min_depth, max_depth):
        h_i, w_i = probs.shape[1:3]
        coarse = _align_pred(coarse_prediction, target)
        if self.loss_type == "incoh":
            gt_mask = get_incoherent_mask(target, (h_i, w_i), min_depth, max_depth)
        elif self.loss_type == "incoh+grad":
            gt_mask = get_incoherent_grad_error_mask(target, coarse, (h_i, w_i), min_depth, max_depth)
        elif self.loss_type == "incoh+grad+depth":
            gt_mask = get_incoherent_grad_value_error_mask(target, coarse, (h_i, w_i), min_depth, max_depth)
        else:
            raise NotImplementedError(self.loss_type)
        if probs.shape[1:3] != target.shape[1:3]:
            probs = resize(probs, target.shape[1:3], "bilinear", True)
        n_classes = probs.shape[-1]
        return (
            _dice_loss(probs, gt_mask, n_classes),
            _focal_loss(probs, gt_mask, alpha=self.focal_weight),
            gt_mask,
        )


# ------------------------------------------------------------ distill
class _Connector(nn.Module):
    embed_dims: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.embed_dims, (1, 1), name="conv")(x)


@MODELS.register_module()
class BaseDistillLoss:
    """MSE feature distillation, optional per-channel SSI alignment
    (losses.py:782-819). Features NHWC. Carries its own connector params
    (init via .init_connector)."""

    def __init__(self, student_trans="conv", teacher_trans="raw", embed_dims=256, ssi_feat=False, **kw):
        self.use_conv = "conv" in student_trans
        self.embed_dims = embed_dims
        self.ssi_feat = ssi_feat
        self.connector = _Connector(embed_dims) if self.use_conv else None

    def init_connector(self, rng, feat_shape):
        if not self.use_conv:
            return {}
        return self.connector.init(rng, jnp.zeros(feat_shape, jnp.float32))

    def __call__(self, student_feat, teacher_feat, depth_gt, min_depth, max_depth, connector_vars=None):
        if self.use_conv:
            student_feat = self.connector.apply(connector_vars, student_feat)
        b, h, w, c = student_feat.shape
        gt = resize(depth_gt, (h, w), "nearest")
        valid = jnp.logical_and(gt > min_depth, gt < max_depth)  # (B,H,W,1)
        m = jnp.broadcast_to(valid, student_feat.shape).astype(jnp.float32)
        s = student_feat
        if self.ssi_feat:
            sp = jnp.transpose(s, (0, 3, 1, 2)).reshape(b * c, h, w)
            tp = jnp.transpose(teacher_feat, (0, 3, 1, 2)).reshape(b * c, h, w)
            mp = jnp.transpose(m, (0, 3, 1, 2)).reshape(b * c, h, w)
            scale, shift = compute_scale_and_shift(sp, tp, mp)
            sp = scale[:, None, None] * sp + shift[:, None, None]
            s = jnp.transpose(sp.reshape(b, c, h, w), (0, 2, 3, 1))
        n = jnp.maximum(jnp.sum(m), 1.0)
        return jnp.sum(((s - teacher_feat) ** 2) * m) / n


@MODELS.register_module()
class StructureDistillLoss:
    """Window-sampled pairwise-similarity distillation (losses.py:845-941)
    with pre-sampled random window anchors (anchor_generation.py:4-37)."""

    def __init__(
        self,
        student_trans="conv",
        teacher_trans="raw",
        embed_dims=256,
        window_size=(31,),
        gamma_window=0.3,
        process_h=384,
        process_w=512,
        region_num=100,
        **kw,
    ):
        self.use_conv = "conv" in student_trans
        self.embed_dims = embed_dims
        self.window_size = tuple(window_size)
        self.gamma_window = gamma_window
        self.region_num = region_num
        self.connector = _Connector(embed_dims) if self.use_conv else None

    def init_connector(self, rng, feat_shape):
        if not self.use_conv:
            return {}
        return self.connector.init(rng, jnp.zeros(feat_shape, jnp.float32))

    def __call__(self, student_feat, teacher_feat, depth_gt, min_depth, max_depth,
                 connector_vars=None, rng=None):
        if self.use_conv:
            student_feat = self.connector.apply(connector_vars, student_feat)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        b, h, w, c = student_feat.shape
        gt = resize(depth_gt, (h, w), "nearest")
        valid = (jnp.logical_and(gt > min_depth, gt < max_depth)).astype(jnp.float32)
        s = student_feat * valid
        t = teacher_feat * valid

        loss = 0.0
        w_window = 1.0
        w_sum = 0.0
        for wi, win in enumerate(self.window_size):
            if wi > 0:
                w_window = w_window * self.gamma_window
            k = win // 2
            rng, kx, ky = jax.random.split(rng, 3)
            ax = jax.random.randint(kx, (b, self.region_num), k + 1, w - k)
            ay = jax.random.randint(ky, (b, self.region_num), k + 1, h - k)
            off = jnp.arange(-k, k + 1)

            def window_sim(feat, ax, ay):
                # gather (win, win, C) windows -> normalized similarity
                def one(axy):
                    x0, y0 = axy
                    rows = y0 + off
                    cols = x0 + off
                    patch = feat[rows[:, None], cols[None, :], :]  # (win, win, C)
                    f = patch.reshape(-1, patch.shape[-1])  # (win*win, C)
                    norm = jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8
                    fn = f / jax.lax.stop_gradient(norm)
                    return fn @ fn.T  # (win*win, win*win)

                return jax.vmap(one)(jnp.stack([ax, ay], axis=-1))

            def mask_sim(mk, ax, ay):
                def one(axy):
                    x0, y0 = axy
                    rows = y0 + off
                    cols = x0 + off
                    patch = mk[rows[:, None], cols[None, :], 0]
                    f = patch.reshape(-1, 1)
                    return f @ f.T

                return jax.vmap(one)(jnp.stack([ax, ay], axis=-1))

            for bi in range(b):
                sim_s = window_sim(s[bi], ax[bi], ay[bi])  # (N, K, K)
                sim_t = window_sim(t[bi], ax[bi], ay[bi])
                vm = mask_sim(valid[bi], ax[bi], ay[bi])
                err = vm * (sim_t - sim_s) ** 2
                loss = loss + (jnp.sum(err) / jnp.maximum(jnp.sum(vm), 1.0)) * w_window / b
            w_sum += w_window
        return loss / w_sum
