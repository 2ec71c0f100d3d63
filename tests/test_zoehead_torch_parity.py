"""Torch-parity for the ZoeDepth metric-bins head (flagship 'softplus' +
inv-attractor 'mean' path): seed bins, 4 attractor layers, conditional
log-binomial, depth = sum(p*c). The torch side is transcribed from the
reference formulas (external/zoedepth/models/layers/{localbins_layers.py,
attractor.py:119-208, dist_layers.py:25-155}, zoedepth_v1.py:125-233), so
this pins the head math AND the bilinear align_corners embedding interps.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.zoedepth import ZoeDepthHead
from patchrefinerv2_tpu.utils.torch_convert import t2f_conv

torch.manual_seed(0)

N_BINS = 8
EMB = 16
N_ATT = (4, 2, 2, 1)
BTL = 24
MIDAS_OUT = 32
MIN_T, MAX_T = 0.0212, 50.0
ALPHA, GAMMA = 1000.0, 2


def _mlp(cin, mid, cout, final):
    return tnn.Sequential(
        tnn.Conv2d(cin, mid, 1), tnn.ReLU(), tnn.Conv2d(mid, cout, 1), final
    )


class TorchZoeHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv2 = tnn.Conv2d(BTL, BTL, 1)
        self.seed_bin = _mlp(BTL, 256, N_BINS, tnn.Softplus())
        self.seed_proj = _mlp(BTL, 128, EMB, tnn.Identity())
        self.projs = tnn.ModuleList([_mlp(BTL, 128, EMB, tnn.Identity()) for _ in range(4)])
        self.atts = tnn.ModuleList(
            [_mlp(EMB, 128, n, tnn.Softplus()) for n in N_ATT]
        )
        bottleneck = (MIDAS_OUT + 1 + EMB) // 2
        self.clb_mlp = tnn.Sequential(
            tnn.Conv2d(MIDAS_OUT + 1 + EMB, bottleneck, 1),
            tnn.GELU(),
            tnn.Conv2d(bottleneck, 4, 1),
            tnn.Softplus(),
        )

    @staticmethod
    def _up(x, size):
        return F.interpolate(x, size, mode="bilinear", align_corners=True)

    def forward(self, rel_depth, out_conv, btlnck, x_blocks):
        x_d0 = self.conv2(btlnck)
        b_prev = self.seed_bin(x_d0)  # softplus centers (unnormed)
        prev_emb = self.seed_proj(x_d0)

        b_centers = b_prev
        emb = prev_emb
        for i, x in enumerate(x_blocks):
            emb = self.projs[i](x)
            # AttractorLayerUnnormed (attractor.py:160-205, kind='mean', inv)
            h = emb + self._up(prev_emb, emb.shape[-2:])
            A = self.atts[i](h)
            bc = self._up(b_prev, h.shape[-2:])
            dx = A.unsqueeze(2) - bc.unsqueeze(1)  # (B, na, nb, H, W)
            # the reference calls dist(dx) WITHOUT forwarding self.alpha/
            # gamma (attractor.py:196), so the jit-script defaults 300/2
            # apply regardless of the configured ALPHA=1000
            delta = (dx / (1 + 300.0 * dx**2)).mean(dim=1)
            b_new = bc + delta
            b_prev, b_centers, prev_emb = b_new, b_new, emb

        rel_cond = self._up(rel_depth, out_conv.shape[-2:])
        last_cat = torch.cat([out_conv, rel_cond], dim=1)
        emb_up = self._up(emb, out_conv.shape[-2:])
        pt = self.clb_mlp(torch.cat([last_cat, emb_up], dim=1))
        p, t = pt[:, :2] + 1e-4, pt[:, 2:] + 1e-4
        p = p[:, 0:1] / (p[:, 0:1] + p[:, 1:2])
        t = t[:, 0:1] / (t[:, 0:1] + t[:, 1:2])
        t = (MAX_T - MIN_T) * t + MIN_T
        # LogBinomial (dist_layers.py:36-70)
        K = N_BINS
        k_idx = torch.arange(K).view(1, -1, 1, 1).float()
        eps = 1e-4
        one_minus_p = torch.clamp(1 - p, eps, 1)
        p = torch.clamp(p, eps, 1)

        def log_binom(n, k, e=1e-7):
            n = n + e
            k = k + e
            return n * torch.log(n) - k * torch.log(k) - (n - k) * torch.log(n - k + e)

        y = log_binom(torch.tensor([K - 1.0]).view(1, 1, 1, 1), k_idx) \
            + k_idx * torch.log(p) + (K - 1 - k_idx) * torch.log(one_minus_p)
        probs = torch.softmax(y / t, dim=1)
        bc_up = self._up(b_centers, probs.shape[-2:])
        return torch.sum(probs * bc_up, dim=1, keepdim=True)


def _conv_params(seq):
    out = {}
    for i, idx in enumerate([0, 2]):
        out[f"Conv_{i}"] = {
            "kernel": t2f_conv(seq[idx].weight.detach().numpy()),
            "bias": seq[idx].bias.detach().numpy(),
        }
    return out


def test_zoe_bins_head_matches_torch():
    tm = TorchZoeHead().eval()
    params = {
        "conv2": {"kernel": t2f_conv(tm.conv2.weight.detach().numpy()),
                  "bias": tm.conv2.bias.detach().numpy()},
        "seed_bin_regressor": _conv_params(tm.seed_bin),
        "seed_projector": _conv_params(tm.seed_proj),
        "conditional_log_binomial": _conv_params(tm.clb_mlp),
    }
    for i in range(4):
        params[f"projector{i}"] = _conv_params(tm.projs[i])
        params[f"attractor{i}"] = _conv_params(tm.atts[i])

    rng = np.random.RandomState(0)
    rel = rng.rand(1, 16, 20, 1).astype(np.float32)
    out_conv = rng.randn(1, 16, 20, MIDAS_OUT).astype(np.float32)
    btl = rng.randn(1, 2, 3, BTL).astype(np.float32)
    x_blocks = [
        rng.randn(1, 2, 3, BTL).astype(np.float32),
        rng.randn(1, 4, 5, BTL).astype(np.float32),
        rng.randn(1, 8, 10, BTL).astype(np.float32),
        rng.randn(1, 16, 20, BTL).astype(np.float32),
    ]

    def nchw(a):
        return torch.tensor(a.transpose(0, 3, 1, 2))

    with torch.no_grad():
        ref = tm(nchw(rel), nchw(out_conv), nchw(btl), [nchw(b) for b in x_blocks])

    head = ZoeDepthHead(
        n_bins=N_BINS, bin_centers_type="softplus", bin_embedding_dim=EMB,
        min_depth=1e-3, max_depth=80.0, n_attractors=N_ATT,
        attractor_alpha=ALPHA, attractor_gamma=GAMMA, attractor_kind="mean",
        attractor_type="inv", min_temp=MIN_T, max_temp=MAX_T,
    )
    pyramid = [jnp.asarray(out_conv), jnp.asarray(btl)] + [jnp.asarray(b) for b in x_blocks]
    out = head.apply({"params": params}, jnp.asarray(rel), pyramid)
    got = np.asarray(out["metric_depth"])
    np.testing.assert_allclose(
        got, ref.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )
