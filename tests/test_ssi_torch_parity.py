"""Torch-golden tests for the scale/shift-invariant and error-aware
losses: the torch side below transcribes the reference formulas
(estimator/models/losses.py: compute_scale_and_shift :523-544, SSI-DA
:547-598, SSI incl. inverse :600-700, EALoss :987-1042) and the flax
losses must match on random masked inputs."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from patchrefinerv2_tpu.models.losses import (
    EALoss,
    ScaleAndShiftInvariantDALoss,
    ScaleAndShiftInvariantLoss,
    compute_scale_and_shift,
)


def _torch_scale_shift(prediction, target, mask):
    a_00 = torch.sum(mask * prediction * prediction, (1, 2))
    a_01 = torch.sum(mask * prediction, (1, 2))
    a_11 = torch.sum(mask, (1, 2))
    b_0 = torch.sum(mask * prediction * target, (1, 2))
    b_1 = torch.sum(mask * target, (1, 2))
    x_0 = torch.zeros_like(b_0)
    x_1 = torch.zeros_like(b_1)
    det = a_00 * a_11 - a_01 * a_01
    valid = det > 0
    x_0[valid] = (a_11[valid] * b_0[valid] - a_01[valid] * b_1[valid]) / det[valid]
    x_1[valid] = (-a_01[valid] * b_0[valid] + a_00[valid] * b_1[valid]) / det[valid]
    return x_0, x_1


def _data(seed=0, b=2, h=24, w=32):
    rng = np.random.RandomState(seed)
    pred = rng.rand(b, h, w).astype(np.float32) * 10 + 0.5
    target = rng.rand(b, h, w).astype(np.float32) * 10 + 0.5
    mask = (rng.rand(b, h, w) > 0.3).astype(np.float32)
    return pred, target, mask


def test_compute_scale_and_shift_matches_torch():
    pred, target, mask = _data()
    rs, rsh = _torch_scale_shift(torch.tensor(pred), torch.tensor(target), torch.tensor(mask))
    gs, gsh = compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    # f32 summation-order noise on near-zero shifts -> small atol
    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gsh), rsh.numpy(), rtol=1e-4, atol=1e-6)


def _torch_ssi(pred, tgt, mask, ssi=True, grad_matching=False, inverse=False):
    prediction, pseudo_label = torch.tensor(pred), torch.tensor(tgt)
    m = torch.tensor(mask)
    if inverse:
        N = torch.sum(m)
        v_pred = prediction[:, 0:-2, :] - prediction[:, 2:, :]
        v_tgt = pseudo_label[:, 0:-2, :] - pseudo_label[:, 2:, :]
        v_m = m[:, 0:-2, :] * m[:, 2:, :]
        h_pred = prediction[:, :, 0:-2] - prediction[:, :, 2:]
        h_tgt = pseudo_label[:, :, 0:-2] - pseudo_label[:, :, 2:]
        h_m = m[:, :, 0:-2] * m[:, :, 2:]
        s, sh = _torch_scale_shift(v_pred, v_tgt, v_m)
        sv = s.view(-1, 1, 1) * v_pred + sh.view(-1, 1, 1)
        s, sh = _torch_scale_shift(h_pred, h_tgt, h_m)
        shp = s.view(-1, 1, 1) * h_pred + sh.view(-1, 1, 1)
        return ((torch.abs(sv - v_tgt) * v_m).sum() + (torch.abs(shp - h_tgt) * h_m).sum()) / N
    if ssi:
        s, sh = _torch_scale_shift(prediction, pseudo_label, m)
        prediction = s.view(-1, 1, 1) * prediction + sh.view(-1, 1, 1)
    if grad_matching:
        N = torch.sum(m)
        d = (prediction - pseudo_label) * m
        v = torch.abs(d[:, 0:-2, :] - d[:, 2:, :]) * (m[:, 0:-2, :] * m[:, 2:, :])
        h = torch.abs(d[:, :, 0:-2] - d[:, :, 2:]) * (m[:, :, 0:-2] * m[:, :, 2:])
        return (h.sum() + v.sum()) / N
    mb = m.bool()
    return F.l1_loss(prediction[mb], pseudo_label[mb])


def test_ssi_loss_variants_match_torch():
    pred, target, mask = _data(1)
    p4 = jnp.asarray(pred)[..., None]
    t4 = jnp.asarray(target)[..., None]
    m4 = jnp.asarray(mask)[..., None]
    for kwargs in (
        dict(ssi=True, grad_matching=False),
        dict(ssi=True, grad_matching=True),
        dict(ssi=False, grad_matching=False),
        dict(inverse=True),
    ):
        ref = float(_torch_ssi(pred, target, mask, **{**dict(ssi=True, grad_matching=False, inverse=False), **kwargs}))
        loss = ScaleAndShiftInvariantLoss(**kwargs)
        got = float(loss(p4, t4, mask=m4, min_depth=1e-3, max_depth=80))
        np.testing.assert_allclose(got, ref, rtol=1e-4, err_msg=str(kwargs))


def test_ssi_da_matches_torch():
    pred, target, mask = _data(2)
    prediction, tgt, m = torch.tensor(pred), torch.tensor(target), torch.tensor(mask)
    mb = m.bool()
    shift_p, shift_t = prediction[mb].mean(), tgt[mb].mean()
    scale_p, scale_t = prediction[mb].std(), tgt[mb].std()
    sp = (prediction - shift_p) / scale_p
    st = (tgt - shift_t) / scale_t
    ref_l1 = float(F.l1_loss(sp[mb], st[mb]))
    N = m.sum()
    d = (sp - st) * m
    v = torch.abs(d[:, 0:-2, :] - d[:, 2:, :]) * (m[:, 0:-2, :] * m[:, 2:, :])
    h = torch.abs(d[:, :, 0:-2] - d[:, :, 2:]) * (m[:, :, 0:-2] * m[:, :, 2:])
    ref_gm = float((h.sum() + v.sum()) / N)

    p4 = jnp.asarray(pred)[..., None]
    t4 = jnp.asarray(target)[..., None]
    m4 = jnp.asarray(mask)[..., None]
    got_l1 = float(ScaleAndShiftInvariantDALoss(grad_matching=False)(p4, t4, mask=m4))
    got_gm = float(ScaleAndShiftInvariantDALoss(grad_matching=True)(p4, t4, mask=m4))
    np.testing.assert_allclose(got_l1, ref_l1, rtol=1e-4)
    np.testing.assert_allclose(got_gm, ref_gm, rtol=1e-4)


def test_ea_loss_matches_torch():
    rng = np.random.RandomState(3)
    b, h, w = 2, 16, 20
    pred = rng.rand(b, h, w).astype(np.float32) * 20 + 0.5
    coarse = rng.rand(b, h, w).astype(np.float32) * 20 + 0.5
    target = rng.rand(b, h, w).astype(np.float32) * 20
    min_d, max_d = 1e-3, 15.0

    ti, tt, tc = torch.tensor(pred), torch.tensor(target), torch.tensor(coarse)
    mask = torch.logical_and(tt > min_d, tt < max_d)
    i, t, c = ti[mask], tt[mask], tc[mask]
    alpha = 1e-7
    g_c = torch.log(c + alpha) - torch.log(t + alpha)
    g_f = (torch.log(i + alpha) - torch.log(t + alpha)) * g_c.pow(2)
    ref = float(10 * torch.sqrt(torch.var(g_f) + 0.15 * g_f.mean() ** 2))

    got = float(
        EALoss()(
            jnp.asarray(pred)[..., None], jnp.asarray(target)[..., None],
            jnp.asarray(coarse)[..., None], min_d, max_d,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_ssi_uncert_matches_torch():
    """ScaleAndShiftInvariantUncertLoss (losses.py:703-779): closed-form
    scale/shift + confidence-weighted (1-uncert) stride-2 gradients."""
    from patchrefinerv2_tpu.models.losses_extra import ScaleAndShiftInvariantUncertLoss

    pred, target, mask = _data(4)
    rng = np.random.RandomState(5)
    uncert = rng.rand(*pred.shape).astype(np.float32)

    prediction, tgt, m = torch.tensor(pred), torch.tensor(target), torch.tensor(mask)
    s, sh = _torch_scale_shift(prediction, tgt, m)
    sp = s.view(-1, 1, 1) * prediction + sh.view(-1, 1, 1)
    conf = 1 - torch.tensor(uncert)
    N = m.sum()
    d = (sp - tgt) * m
    v = torch.abs(d[:, 0:-2, :] - d[:, 2:, :]) * (m[:, 0:-2, :] * m[:, 2:, :])
    v = v * ((conf[:, 0:-2, :] + conf[:, 2:, :]) / 2)
    h = torch.abs(d[:, :, 0:-2] - d[:, :, 2:]) * (m[:, :, 0:-2] * m[:, :, 2:])
    h = h * ((conf[:, :, 0:-2] + conf[:, :, 2:]) / 2)
    ref_gm = float((h.sum() + v.sum()) / N)

    loss = ScaleAndShiftInvariantUncertLoss(grad_matching=True)
    got = float(
        loss(
            jnp.asarray(pred)[..., None], jnp.asarray(target)[..., None],
            None, jnp.asarray(mask)[..., None], 1e-3, 80.0,
            jnp.asarray(uncert)[..., None],
        )
    )
    np.testing.assert_allclose(got, ref_gm, rtol=1e-4)


def test_edge_cls_loss_matches_torch_formulas():
    """EdgeClsLoss (losses.py:183-204): kornia-style multiclass dice +
    focal over 2-class probabilities."""
    from patchrefinerv2_tpu.models.losses_extra import EdgeClsLoss

    rng = np.random.RandomState(6)
    b, h, w = 2, 12, 16
    logits = rng.randn(b, h, w, 2).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = (rng.rand(b, h, w) > 0.5).astype(np.int32)

    # torch/kornia transcription
    tp = torch.tensor(probs)
    tl = torch.tensor(labels).long()
    onehot = F.one_hot(tl, 2).float()
    dims = (1, 2)
    inter = (tp * onehot).sum(dims)
    card = (tp + onehot).sum(dims)
    ref_dice = float((1.0 - 2.0 * inter / (card + 1e-8)).mean())
    logp = torch.log(tp.clamp(1e-8, 1.0))
    focal = -0.5 * (1 - tp) ** 2.0 * logp
    ref_focal = float((onehot * focal).sum(-1).mean())

    loss = EdgeClsLoss(focal_weight=0.5)
    dice, focal_got = loss(jnp.asarray(probs), jnp.asarray(labels))
    np.testing.assert_allclose(float(dice), ref_dice, rtol=1e-4)
    np.testing.assert_allclose(float(focal_got), ref_focal, rtol=1e-4)
