"""ZoeDepth metric-bins head over a relative-depth core (flax, NHWC).

Capability match for external/zoedepth/models/zoedepth/zoedepth_v1.py:39-315
plus its layer library (layers/localbins_layers.py, attractor.py,
dist_layers.py). The head is pure math over the core's explicit outputs —
no hooks:

  core(x) -> (rel_depth (B,H,W,1), pyramid = [out_conv32, btlnck, x_block0..3])

Head pipeline (zoedepth_v1.py:173-233): btlnck 1x1 conv -> seed bin centers
(softplus/normed) -> 4 attractor refinements over decoder levels (inv/exp
attractor, mean/sum aggregation) -> conditional log-binomial probs over the
32ch final feature + upsampled rel depth -> depth = sum(p * centers).

Also defines DepthAnythingCore: DINOv2 ViT + v1 DPT relative head
(external/depth_anything/dpt.py:20-130, zoedepth wrapper
base_models/depth_anything.py:193-340) emitting the 6 taps explicitly
(out_conv = ReLU activation inside output_conv2, l4_rn, r4..r1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.convs import relu
from patchrefinerv2_tpu.models.blocks.dpt import FeatureFusionBlock
from patchrefinerv2_tpu.models.backbones.vit import DinoViT
from patchrefinerv2_tpu.models.backbones.dpt import IMAGENET_MEAN, IMAGENET_STD
from patchrefinerv2_tpu.ops.resize import resize


def _interp(x, size):
    return resize(x, size, mode="bilinear", align_corners=True)


def exp_attractor(dx, alpha: float, gamma: int):
    """attractor.py:29-42."""
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


def inv_attractor(dx, alpha: float, gamma: int):
    """attractor.py:45-59 (the default per the paper)."""
    return dx / (1 + alpha * dx**gamma)


# Reference quirk (attractor.py:85-136, 164-207): BOTH AttractorLayer
# forward paths call ``dist(dx)`` without forwarding self.alpha/self.gamma,
# so the torch.jit.script defaults alpha=300, gamma=2 are what every
# published checkpoint was trained with — the config's attractor_alpha=1000
# (config_zoedepth.json:9, estimator configs) is recorded but inert. We
# keep the config fields for schema parity but compute with the defaults.
_ATTRACTOR_ALPHA = 300.0
_ATTRACTOR_GAMMA = 2


class SeedBinRegressorUnnormed(nn.Module):
    """localbins_layers.py:71-96: softplus MLP, centers unbounded."""

    n_bins: int
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        c = nn.softplus(nn.Conv(self.n_bins, (1, 1))(h))
        return c, c


class SeedBinRegressorNormed(nn.Module):
    """localbins_layers.py:29-68: normalized widths -> cumsum centers."""

    n_bins: int
    min_depth: float
    max_depth: float
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        B = relu(nn.Conv(self.n_bins, (1, 1))(h)) + 1e-3
        widths_normed = B / B.sum(axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths_normed
        widths = jnp.pad(
            widths, [(0, 0)] * (widths.ndim - 1) + [(1, 0)], constant_values=self.min_depth
        )
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_normed, centers


class Projector(nn.Module):
    """localbins_layers.py:99-119."""

    out: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        return nn.Conv(self.out, (1, 1))(h)


class AttractorLayerUnnormed(nn.Module):
    """attractor.py:119-208 (softplus attractor points, unbounded centers)."""

    n_bins: int
    n_attractors: int
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "mean"
    attractor_type: str = "inv"
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = _interp(prev_b_embedding, x.shape[1:3])
            x = x + prev_b_embedding
        h = relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        A = nn.softplus(nn.Conv(self.n_attractors, (1, 1))(h))  # (B,H,W,na)
        b_centers = _interp(b_prev, x.shape[1:3])  # (B,H,W,nb)
        dist = inv_attractor if self.attractor_type == "inv" else exp_attractor
        dx = A[..., :, None] - b_centers[..., None, :]  # (B,H,W,na,nb)
        # quirk match: the reference never forwards self.alpha/gamma
        # (see _ATTRACTOR_ALPHA note above)
        delta = dist(dx, _ATTRACTOR_ALPHA, _ATTRACTOR_GAMMA)
        delta = delta.mean(axis=-2) if self.kind == "mean" else delta.sum(axis=-2)
        b_new = b_centers + delta
        return b_new, b_new


class AttractorLayerNormed(nn.Module):
    """attractor.py:60-117 (linear-normed attractors, bounded centers)."""

    n_bins: int
    n_attractors: int
    min_depth: float
    max_depth: float
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "mean"
    attractor_type: str = "inv"
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = _interp(prev_b_embedding, x.shape[1:3])
            x = x + prev_b_embedding
        h = relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        A = relu(nn.Conv(self.n_attractors * 2, (1, 1))(h)) + 1e-3
        b, hh, ww, _ = A.shape
        A = A.reshape(b, hh, ww, self.n_attractors, 2)
        # reference takes the *unnormalized* first component (attractor.py:86-88)
        A_normed = A[..., 0]
        b_centers = _interp(b_prev, x.shape[1:3])
        dist = inv_attractor if self.attractor_type == "inv" else exp_attractor
        dx = A_normed[..., :, None] - b_centers[..., None, :]
        # quirk match: the reference never forwards self.alpha/gamma
        # (see _ATTRACTOR_ALPHA note above)
        delta = dist(dx, _ATTRACTOR_ALPHA, _ATTRACTOR_GAMMA)
        delta = delta.mean(axis=-2) if self.kind == "mean" else delta.sum(axis=-2)
        b_new = b_centers + delta
        B_centers = (self.max_depth - self.min_depth) * b_new + self.min_depth
        B_centers = jnp.sort(B_centers, axis=-1)
        B_centers = jnp.clip(B_centers, self.min_depth, self.max_depth)
        return b_new, B_centers


def log_binom(n, k, eps=1e-7):
    """Stirling log(nCk) (dist_layers.py:25-33).

    Written with xlogy: the naive ``(n-k)*log(n-k+eps)`` form is rewritten by
    XLA's algebraic simplifier into a 0*log(0) pattern at k = n that folds to
    NaN under jit (eager is fine) — xlogy is NaN-safe by definition."""
    from jax.scipy.special import xlogy

    n = n + eps
    k = k + eps
    return xlogy(n, n) - xlogy(k, k) - xlogy(n - k, n - k + eps)


class ConditionalLogBinomial(nn.Module):
    """dist_layers.py:78-155: MLP -> (p, t) -> binomial distribution."""

    n_classes: int
    bottleneck: int
    min_temp: float = 1e-7
    max_temp: float = 50.0
    p_eps: float = 1e-4

    @nn.compact
    def __call__(self, x, cond):
        h = jnp.concatenate([x, cond], axis=-1)
        h = nn.Conv(self.bottleneck, (1, 1))(h)
        h = nn.gelu(h, approximate=False)
        pt = nn.softplus(nn.Conv(4, (1, 1))(h))
        p, t = pt[..., :2], pt[..., 2:]
        p = p + self.p_eps
        p = p[..., 0] / (p[..., 0] + p[..., 1])
        t = t + self.p_eps
        t = t[..., 0] / (t[..., 0] + t[..., 1])
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        # log binomial over n_classes (dist_layers.py:36-76)
        K = self.n_classes
        k_idx = jnp.arange(K, dtype=jnp.float32)
        p = jnp.clip(p[..., None], 1e-4, 1.0)
        one_minus_p = jnp.clip(1.0 - p, 1e-4, 1.0)
        y = (
            log_binom(jnp.float32(K - 1), k_idx)
            + k_idx * jnp.log(p)
            + (K - 1 - k_idx) * jnp.log(one_minus_p)
        )
        return nn.softmax(y / t[..., None], axis=-1)


class DPTRelHead(nn.Module):
    """Depth-Anything v1 DPT head emitting all core taps explicitly
    (external/depth_anything/dpt.py:20-130). Returns
    (rel_depth, [out_conv32, l4_rn, r4, r3, r2, r1])."""

    in_grid: tuple[int, int]
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, tap_tokens):
        ph, pw = self.in_grid
        levels = []
        for i, (tokens, _cls) in enumerate(tap_tokens):
            b, n, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4), name="resize0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2), name="resize1")(x)
            elif i == 3:
                # torch pads k//2 both sides on this stride-2 conv
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize3")(x)
            levels.append(x)
        l1, l2, l3, l4 = levels
        l1rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer1_rn")(l1)
        l2rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer2_rn")(l2)
        l3rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer3_rn")(l3)
        l4rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer4_rn")(l4)

        r4 = FeatureFusionBlock(self.features, name="refinenet4")(l4rn, size=l3rn.shape[1:3])
        r3 = FeatureFusionBlock(self.features, name="refinenet3")(r4, l3rn, size=l2rn.shape[1:3])
        r2 = FeatureFusionBlock(self.features, name="refinenet2")(r3, l2rn, size=l1rn.shape[1:3])
        r1 = FeatureFusionBlock(self.features, name="refinenet1")(r2, l1rn)

        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(r1)
        out = _interp(out, (ph * 14, pw * 14))
        out_conv = relu(nn.Conv(32, (3, 3), name="output_conv2_0")(out))
        rel = relu(nn.Conv(1, (1, 1), name="output_conv2_1")(out_conv))
        return rel, [out_conv, l4rn, r4, r3, r2, r1]


class DepthAnythingCore(nn.Module):
    """DINOv2 + v1 relative head, ImageNet normalization
    (base_models/depth_anything.py:184-186)."""

    encoder: str = "vits"
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        ph, pw = x.shape[1] // 14, x.shape[2] // 14
        taps = DinoViT(variant=self.encoder, name="pretrained")(x)
        rel, pyramid = DPTRelHead(
            in_grid=(ph, pw),
            features=self.features,
            out_channels=tuple(self.out_channels),
            name="depth_head",
        )(taps)
        return rel, pyramid


class ZoeDepthHead(nn.Module):
    """Metric-bins head over core outputs (zoedepth_v1.py:125-233).

    __call__(rel_depth, pyramid) -> dict(metric_depth, coarse_features)
    where coarse_features = [x_d0, x_blocks 0..3, midas_final_feat] — the
    6-level contract (patchrefinerplus.py:225-237).
    """

    n_bins: int = 64
    bin_centers_type: str = "softplus"
    bin_embedding_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_alpha: float = 300.0
    attractor_gamma: int = 2
    attractor_kind: str = "sum"
    attractor_type: str = "exp"
    min_temp: float = 5.0
    max_temp: float = 50.0
    n_midas_out: int = 32

    @nn.compact
    def __call__(self, rel_depth, pyramid):
        out_conv, btlnck, *x_blocks = pyramid
        btl_c = btlnck.shape[-1]
        temp = {}
        x_d0 = nn.Conv(btl_c, (1, 1), name="conv2")(btlnck)
        temp["x_d0"] = x_d0

        if self.bin_centers_type in ("normed", "hybrid2"):
            _, seed_centers = SeedBinRegressorNormed(
                self.n_bins, self.min_depth, self.max_depth, name="seed_bin_regressor"
            )(x_d0)
            b_prev = (seed_centers - self.min_depth) / (self.max_depth - self.min_depth)
        else:
            _, seed_centers = SeedBinRegressorUnnormed(self.n_bins, name="seed_bin_regressor")(x_d0)
            b_prev = seed_centers

        prev_emb = Projector(self.bin_embedding_dim, name="seed_projector")(x_d0)

        normed_attractors = self.bin_centers_type in ("normed", "hybrid2")
        b_centers = b_prev
        b_embedding = prev_emb
        for i, x in enumerate(x_blocks):
            b_embedding = Projector(self.bin_embedding_dim, name=f"projector{i}")(x)
            temp[f"x_blocks_feat_{i}"] = x
            if normed_attractors:
                b, b_centers = AttractorLayerNormed(
                    self.n_bins,
                    self.n_attractors[i],
                    self.min_depth,
                    self.max_depth,
                    self.attractor_alpha,
                    self.attractor_gamma,
                    self.attractor_kind,
                    self.attractor_type,
                    name=f"attractor{i}",
                )(b_embedding, b_prev, prev_emb)
            else:
                b, b_centers = AttractorLayerUnnormed(
                    self.n_bins,
                    self.n_attractors[i],
                    self.attractor_alpha,
                    self.attractor_gamma,
                    self.attractor_kind,
                    self.attractor_type,
                    name=f"attractor{i}",
                )(b_embedding, b_prev, prev_emb)
            b_prev = b
            prev_emb = b_embedding

        last = out_conv
        temp["midas_final_feat"] = last
        rel_cond = _interp(rel_depth, last.shape[1:3])
        last_cat = jnp.concatenate([last, rel_cond], axis=-1)
        b_embedding_up = _interp(b_embedding, last.shape[1:3])
        self.sow("intermediates", "clb_x", last_cat)
        self.sow("intermediates", "clb_cond", b_embedding_up)
        self.sow("intermediates", "b_centers", b_centers)
        probs = ConditionalLogBinomial(
            self.n_bins,
            bottleneck=(self.n_midas_out + 1 + self.bin_embedding_dim) // 2,
            min_temp=self.min_temp,
            max_temp=self.max_temp,
            name="conditional_log_binomial",
        )(last_cat, b_embedding_up)
        b_centers_up = _interp(b_centers, probs.shape[1:3])
        depth = jnp.sum(probs * b_centers_up, axis=-1, keepdims=True)
        # bin math runs in f32 for stability; the OUTPUT must match the
        # compute dtype or it silently promotes every downstream consumer
        # (fusion/decoder) to f32
        depth = depth.astype(last.dtype)

        coarse_features = [
            temp["x_d0"],
            temp["x_blocks_feat_0"],
            temp["x_blocks_feat_1"],
            temp["x_blocks_feat_2"],
            temp["x_blocks_feat_3"],
            temp["midas_final_feat"],
        ]
        return {"metric_depth": depth, "coarse_features": coarse_features}


class ZoeDepthDA(nn.Module):
    """'DA-ZoeDepth' coarse branch: ZoeDepth bins head over DepthAnythingCore
    (patchrefinerplus.py:110-116, zoedepth_v1.py:296-311)."""

    encoder: str = "vits"
    core_features: int = 64
    core_out_channels: Sequence[int] = (48, 96, 192, 384)
    n_bins: int = 64
    bin_centers_type: str = "softplus"
    bin_embedding_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_alpha: float = 300.0
    attractor_gamma: int = 2
    attractor_kind: str = "sum"
    attractor_type: str = "exp"
    min_temp: float = 5.0
    max_temp: float = 50.0

    @nn.compact
    def __call__(self, x):
        rel, pyramid = DepthAnythingCore(
            encoder=self.encoder,
            features=self.core_features,
            out_channels=tuple(self.core_out_channels),
            name="core",
        )(x)
        return ZoeDepthHead(
            n_bins=self.n_bins,
            bin_centers_type=self.bin_centers_type,
            bin_embedding_dim=self.bin_embedding_dim,
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            n_attractors=tuple(self.n_attractors),
            attractor_alpha=self.attractor_alpha,
            attractor_gamma=self.attractor_gamma,
            attractor_kind=self.attractor_kind,
            attractor_type=self.attractor_type,
            min_temp=self.min_temp,
            max_temp=self.max_temp,
            name="head",
        )(rel, pyramid)
