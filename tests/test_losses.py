"""Golden tests for the loss numerics vs torch implementations of the
reference formulas (losses.py:21-67, 943-984, 523-700)."""

import numpy as np
import torch

from patchrefinerv2_tpu.models.losses import (
    GradMatchLoss,
    SILogLoss,
    ScaleAndShiftInvariantDALoss,
    ScaleAndShiftInvariantLoss,
    compute_scale_and_shift,
)


def _rand(shape, seed, lo=0.5, hi=20.0):
    rng = np.random.RandomState(seed)
    return (lo + (hi - lo) * rng.rand(*shape)).astype(np.float32)


def torch_silog(pred, target, min_d, max_d, beta=0.15):
    pred_t = torch.from_numpy(pred)
    tgt_t = torch.from_numpy(target)
    mask = torch.logical_and(tgt_t > min_d, tgt_t < max_d)
    p = pred_t[mask]
    t = tgt_t[mask]
    g = torch.log(p + 1e-7) - torch.log(t + 1e-7)
    Dg = torch.var(g) + beta * torch.mean(g) ** 2
    return float(10 * torch.sqrt(Dg))


def test_silog_matches_torch():
    pred = _rand((2, 16, 24, 1), 0)
    target = _rand((2, 16, 24, 1), 1)
    target[0, :4] = 0.0  # invalid region exercises the mask
    ref = torch_silog(pred, target, 1e-3, 80.0)
    got = float(SILogLoss()(pred, target, 1e-3, 80.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def torch_gradmatch(pred, target, min_d, max_d):
    # stride-2 gradient of masked difference (losses.py:943-984); note the
    # reference indexes dims (1, 2) of NCHW-squeezed tensors -> here HW
    p = torch.from_numpy(pred[..., 0])
    t = torch.from_numpy(target[..., 0])
    mask = torch.logical_and(t > min_d, t < max_d).float()
    N = mask.sum()
    d = (p - t) * mask
    v = (d[:, :-2, :] - d[:, 2:, :]).abs() * mask[:, :-2, :] * mask[:, 2:, :]
    h = (d[:, :, :-2] - d[:, :, 2:]).abs() * mask[:, :, :-2] * mask[:, :, 2:]
    return float((h.sum() + v.sum()) / N)


def test_gradmatch_matches_torch():
    pred = _rand((2, 16, 24, 1), 2)
    target = _rand((2, 16, 24, 1), 3)
    target[1, 8:] = 100.0  # out of range
    ref = torch_gradmatch(pred, target, 1e-3, 80.0)
    got = float(GradMatchLoss()(pred, target, 1e-3, 80.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_scale_shift_closed_form():
    pred = _rand((2, 16, 24), 4)
    target = 2.0 * pred + 3.0 + 0.01 * _rand((2, 16, 24), 5, 0, 1)
    mask = np.ones_like(pred)
    s, sh = compute_scale_and_shift(pred, target, mask)
    np.testing.assert_allclose(np.asarray(s), [2.0, 2.0], atol=0.01)
    np.testing.assert_allclose(np.asarray(sh), [3.0, 3.0], atol=0.2)


def test_ssi_loss_zero_for_affine_match():
    pred = _rand((1, 16, 24, 1), 6)
    target = 1.7 * pred + 0.4
    mask = np.ones(pred.shape, bool)
    loss = float(
        ScaleAndShiftInvariantLoss(ssi=True, grad_matching=False)(
            pred, target, None, mask, 1e-3, 80.0
        )
    )
    assert loss < 1e-4


def test_ssi_da_mean_std_alignment():
    pred = _rand((1, 16, 24, 1), 7)
    # same standardized field => zero loss under mean/std alignment
    target = 3.0 * pred - 1.0
    mask = np.ones(pred.shape, bool)
    loss = float(
        ScaleAndShiftInvariantDALoss(grad_matching=True)(
            pred, target, None, mask, 1e-3, 80.0
        )
    )
    assert loss < 1e-4
