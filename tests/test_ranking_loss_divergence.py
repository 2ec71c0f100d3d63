"""Quantify the EdgeguidedRankingLoss redesign divergence (VERDICT r1 #6).

The TPU loss (losses_extra.py) replaces the reference's per-step CPU
canny anchor extraction + dynamic gathers (losses.py:256-520) with an
in-graph Sobel-threshold edge mask + static categorical sampling. Bit
parity is impossible (different RNGs, different edge detectors); the
claim to pin is *statistical* equivalence as a training signal:

1. the loss VALUE distributions over many RNG seeds overlap (same mean
   within a tolerance comparable to the seed noise), and
2. the seed-averaged GRADIENTS w.r.t. the prediction point the same way
   (cosine similarity well above chance).

The reference implementation is ported 1:1 below on torch CPU (same
sampling geometry incl. the p<0.5 swapped sin/cos branch, the
kornia-normalized-sobel "thetas" quirk, canny anchors via
evaluation.metrics.extract_edges, randperm random sampling, per-image
mean over kept pairs), reference estimator/models/losses.py:256-520.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.evaluation.metrics import extract_edges
from patchrefinerv2_tpu.models.losses_extra import EdgeguidedRankingLoss

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)

POINT_PAIRS = 1500
SIGMA = 0.03
H, W = 64, 96


def _kornia_sobel_magnitude(t):
    """kornia.filters.sobel(x, normalized=True, eps=1e-6) — the reference
    feeds this MAGNITUDE in as 'thetas' (losses.py:459)."""
    kx = torch.tensor([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                      dtype=t.dtype) / 8.0
    ky = torch.tensor([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]],
                      dtype=t.dtype) / 8.0
    tp = F.pad(t, (1, 1, 1, 1), mode="replicate")
    gx = F.conv2d(tp, kx.view(1, 1, 3, 3))
    gy = F.conv2d(tp, ky.view(1, 1, 3, 3))
    return torch.sqrt(gx * gx + gy * gy + 1e-6)


def reference_ranking_loss(inputs, targets, depth_gt, point_pairs=POINT_PAIRS,
                           sigma=SIGMA, alpha=1.0, min_depth=1e-3, max_depth=80):
    """Reference EdgeguidedRankingLoss.forward, interpolate=False,
    only_missing_area=False, random_direct=True (losses.py:430-520)."""
    n = inputs.shape[0]
    strict_mask = torch.logical_and(depth_gt > min_depth, depth_gt < max_depth)
    edges_img = torch.stack([
        torch.from_numpy(
            extract_edges(targets[i, 0].detach().numpy(), use_canny=True, preprocess="log") > 0
        )
        for i in range(n)
    ]).unsqueeze(1)
    thetas_img = _kornia_sobel_magnitude(targets)

    loss = torch.zeros((), dtype=torch.double)
    sample_sum = 0.0
    for i in range(n):
        inp = inputs[i, 0]
        tgt = targets[i, 0]
        edges_mask = torch.logical_and(edges_img[i, 0], strict_mask[i, 0])
        edges_loc = edges_mask.nonzero()
        if edges_loc.shape[0] == 0:
            continue
        sample_index = torch.randint(0, edges_loc.shape[0], (point_pairs,))
        sh, sw = edges_loc[sample_index, 0], edges_loc[sample_index, 1]
        theta = thetas_img[i, 0][sh, sw]
        dist = torch.randint(2, 31, (4, point_pairs)).double()
        signs = torch.ones(4, point_pairs)
        signs[:2] = -1
        dist = dist * signs
        if torch.rand(()) < 0.5:
            col = sw.unsqueeze(0) + torch.round(dist * torch.cos(theta).unsqueeze(0)).long()
            row = sh.unsqueeze(0) + torch.round(dist * torch.sin(theta).unsqueeze(0)).long()
        else:
            theta = theta + math.pi / 2
            theta = (theta + math.pi) % (2 * math.pi) - math.pi
            col = sw.unsqueeze(0) + torch.round(dist * torch.sin(theta).unsqueeze(0)).long()
            row = sh.unsqueeze(0) + torch.round(dist * torch.cos(theta).unsqueeze(0)).long()
        invalid = ((col < 0) | (col > W - 1) | (row < 0) | (row > H - 1)).sum(0) > 0
        col, row = col[:, ~invalid], row[:, ~invalid]
        if col.numel() == 0:
            continue
        A_r = torch.cat([row[0], row[1], row[2]])
        A_c = torch.cat([col[0], col[1], col[2]])
        B_r = torch.cat([row[1], row[2], row[3]])
        B_c = torch.cat([col[1], col[2], col[3]])
        n_e = A_r.shape[0]  # 3 pairs per surviving anchor (losses.py:398)
        inputs_A, inputs_B = inp[A_r, A_c], inp[B_r, B_c]
        targets_A, targets_B = tgt[A_r, A_c], tgt[B_r, B_c]
        sample_sum += n_e

        valid_idx = strict_mask[i, 0].reshape(-1).nonzero().squeeze(1)
        k = min(n_e, valid_idx.shape[0])
        p1 = valid_idx[torch.randperm(valid_idx.shape[0])[:k]]
        p2 = valid_idx[torch.randperm(valid_idx.shape[0])[:k]]
        flat_in, flat_t = inp.reshape(-1), tgt.reshape(-1)
        inputs_A = torch.cat([inputs_A, flat_in[p1]])
        inputs_B = torch.cat([inputs_B, flat_in[p2]])
        targets_A = torch.cat([targets_A, flat_t[p1]])
        targets_B = torch.cat([targets_B, flat_t[p2]])
        sample_sum += k

        inputs_A = inputs_A / (250 / 80)
        inputs_B = inputs_B / (250 / 80)
        ratio = (targets_A + 1e-6) / (targets_B + 1e-6)
        mask_eq = (ratio < 1.0 + sigma) & (ratio > 1.0 / (1.0 + sigma))
        labels = torch.zeros_like(ratio)
        labels[ratio >= 1.0 + sigma] = 1
        labels[ratio <= 1.0 / (1.0 + sigma)] = -1
        equal_loss = (inputs_A - inputs_B).pow(2) * mask_eq.double()
        unequal_loss = torch.log1p(torch.exp((-inputs_A + inputs_B) * labels)) * (~mask_eq).double()
        loss = loss + alpha * equal_loss.mean() + unequal_loss.mean()
    return loss / n, sample_sum / n


def _fixture(seed=0):
    """Structured depth: piecewise-constant rooms + ramp; pred = warped gt
    with local rank violations near edges."""
    rng = np.random.RandomState(seed)
    gt = np.full((2, H, W), 4.0, np.float32)
    gt[:, :, W // 3 :] = 9.0
    gt[:, H // 2 :, :] += 6.0
    gt[:, :, 2 * W // 3 :] = 20.0
    ramp = np.linspace(0, 3, W, dtype=np.float32)[None, None, :]
    gt = gt + ramp
    pred = gt * 1.1 - 0.5 + rng.randn(2, H, W).astype(np.float32) * 1.5
    return pred, gt


@pytest.mark.parametrize("n_seeds", [24])
def test_ranking_loss_statistical_parity(n_seeds):
    pred_np, gt_np = _fixture()

    # --- reference port: loss values + grads over seeds
    ref_losses, ref_grads = [], []
    for s in range(n_seeds):
        torch.manual_seed(100 + s)
        p = torch.tensor(pred_np[:, None], dtype=torch.double, requires_grad=True)
        t = torch.tensor(gt_np[:, None], dtype=torch.double)
        loss, cnt = reference_ranking_loss(p, t, t)
        loss.backward()
        ref_losses.append(float(loss))
        ref_grads.append(p.grad[:, 0].numpy().copy())
        assert cnt > 0

    # --- TPU loss: same fixture, jax PRNG seeds
    ours = EdgeguidedRankingLoss(point_pairs=POINT_PAIRS, sigma=SIGMA)
    pj = jnp.asarray(pred_np)[..., None]
    tj = jnp.asarray(gt_np)[..., None]

    def loss_fn(p, key):
        l, _ = ours(p, tj, depth_gt=tj, rng=key)
        return l

    vg = jax.jit(jax.value_and_grad(loss_fn))
    our_losses, our_grads = [], []
    for s in range(n_seeds):
        l, g = vg(pj, jax.random.PRNGKey(200 + s))
        our_losses.append(float(l))
        our_grads.append(np.asarray(g)[..., 0])

    ref_mean, ref_std = np.mean(ref_losses), np.std(ref_losses)
    our_mean, our_std = np.mean(our_losses), np.std(our_losses)
    # 1. loss scale: means agree within 25% (seed stds are ~1-3% here;
    #    the residual gap is the canny-vs-sobel anchor set difference)
    assert abs(ref_mean - our_mean) / ref_mean < 0.25, (
        f"loss mean diverged: ref {ref_mean:.4f}±{ref_std:.4f} "
        f"vs ours {our_mean:.4f}±{our_std:.4f}"
    )

    # 2. training signal direction: seed-averaged gradients align
    rg = np.mean(ref_grads, axis=0).ravel()
    og = np.mean(our_grads, axis=0).ravel()
    cos = float(rg @ og / (np.linalg.norm(rg) * np.linalg.norm(og) + 1e-12))
    assert cos > 0.85, f"gradient cosine {cos:.3f}"
