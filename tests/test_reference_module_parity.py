"""Parity vs the ACTUAL reference torch modules, imported from
/root/reference (read-only) — not test-local re-typings.

The pure-torch subset of the reference imports cleanly without mmengine:
external/zoedepth/models/layers/{attractor,dist_layers,localbins_layers}.py
and external/depth_anything/blocks.py. These tests pin the numerically
hardest head components (bins seeding, attractor iterations, conditional
log-binomial, DPT fusion block) against those modules directly, removing
the common-mode-error risk of re-typed torch layouts.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

sys.path.insert(0, "/root/reference/external")
sys.path.insert(0, "/root/reference")

from zoedepth.models.layers.attractor import (  # noqa: E402
    AttractorLayer as RefAttractorLayer,
    AttractorLayerUnnormed as RefAttractorLayerUnnormed,
)
from zoedepth.models.layers.dist_layers import (  # noqa: E402
    ConditionalLogBinomial as RefConditionalLogBinomial,
)
from zoedepth.models.layers.localbins_layers import (  # noqa: E402
    Projector as RefProjector,
    SeedBinRegressor as RefSeedBinRegressor,
    SeedBinRegressorUnnormed as RefSeedBinRegressorUnnormed,
)
from external.depth_anything.blocks import (  # noqa: E402
    FeatureFusionBlock as RefFeatureFusionBlock,
)

from patchrefinerv2_tpu.models.backbones.zoedepth import (  # noqa: E402
    AttractorLayerNormed,
    AttractorLayerUnnormed,
    ConditionalLogBinomial,
    Projector,
    SeedBinRegressorNormed,
    SeedBinRegressorUnnormed,
)
from patchrefinerv2_tpu.models.blocks.dpt import FeatureFusionBlock  # noqa: E402
from patchrefinerv2_tpu.utils.torch_convert import t2f_conv  # noqa: E402

torch.manual_seed(7)


def _nhwc(t):
    return np.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def _conv_p(conv):
    p = {"kernel": t2f_conv(conv.weight.detach().numpy())}
    if conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy()
    return p


def _seq_params(seq, idxs=(0, 2)):
    return {f"Conv_{i}": _conv_p(seq[idx]) for i, idx in enumerate(idxs)}


def _rand(shape, scale=1.0, seed=0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


def test_seed_bin_regressor_unnormed_vs_reference():
    ref = RefSeedBinRegressorUnnormed(24, n_bins=8, mlp_dim=64).eval()
    x = _rand((2, 6, 7, 24), seed=1)
    with torch.no_grad():
        _, ref_centers = ref(_nchw(x))
    mod = SeedBinRegressorUnnormed(n_bins=8, mlp_dim=64)
    out, _ = mod.apply({"params": _seq_params(ref._net)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref_centers),
                               atol=1e-5, rtol=1e-5)


def test_seed_bin_regressor_normed_vs_reference():
    ref = RefSeedBinRegressor(24, n_bins=8, mlp_dim=64,
                              min_depth=1e-3, max_depth=10.0).eval()
    x = _rand((2, 6, 7, 24), seed=2)
    with torch.no_grad():
        ref_widths, ref_centers = ref(_nchw(x))
    mod = SeedBinRegressorNormed(n_bins=8, min_depth=1e-3, max_depth=10.0,
                                 mlp_dim=64)
    widths, centers = mod.apply({"params": _seq_params(ref._net)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(widths), _nhwc(ref_widths),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(centers), _nhwc(ref_centers),
                               atol=1e-5, rtol=1e-5)


def test_projector_vs_reference():
    ref = RefProjector(24, 16, mlp_dim=48).eval()
    x = _rand((2, 5, 9, 24), seed=3)
    with torch.no_grad():
        ref_out = ref(_nchw(x))
    out = Projector(out=16, mlp_dim=48).apply(
        {"params": _seq_params(ref._net)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("attractor_type,kind", [("inv", "mean"), ("exp", "sum")])
def test_attractor_unnormed_vs_reference(attractor_type, kind):
    # constructed with alpha=1000 on BOTH sides: the reference forward never
    # forwards self.alpha/gamma into dist() (attractor.py:196), so the
    # jit-script defaults (300, 2) are what actually runs — the flax side
    # reproduces that quirk (models/backbones/zoedepth.py:_ATTRACTOR_ALPHA)
    ref = RefAttractorLayerUnnormed(
        16, n_bins=8, n_attractors=4, mlp_dim=32, alpha=1000, gamma=2,
        kind=kind, attractor_type=attractor_type).eval()
    x = _rand((2, 8, 10, 16), seed=4)
    b_prev = np.abs(_rand((2, 4, 5, 8), seed=5)) + 0.1
    emb = _rand((2, 4, 5, 16), seed=6)
    with torch.no_grad():
        ref_b, _ = ref(_nchw(x), _nchw(b_prev), prev_b_embedding=_nchw(emb),
                       interpolate=True)
    mod = AttractorLayerUnnormed(
        n_bins=8, n_attractors=4, alpha=1000.0, gamma=2, kind=kind,
        attractor_type=attractor_type, mlp_dim=32)
    b_new, _ = mod.apply({"params": _seq_params(ref._net)}, jnp.asarray(x),
                         jnp.asarray(b_prev), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(b_new), _nhwc(ref_b),
                               atol=1e-5, rtol=1e-5)


def test_attractor_normed_vs_reference():
    ref = RefAttractorLayer(
        16, n_bins=8, n_attractors=4, mlp_dim=32, alpha=1000, gamma=2,
        kind="mean", attractor_type="inv", min_depth=1e-3, max_depth=10.0).eval()
    x = _rand((2, 8, 10, 16), seed=7)
    b_prev = np.abs(_rand((2, 4, 5, 8), seed=8)) * 0.1 + 0.05
    emb = _rand((2, 4, 5, 16), seed=9)
    with torch.no_grad():
        ref_b, ref_B = ref(_nchw(x), _nchw(b_prev), prev_b_embedding=_nchw(emb),
                           interpolate=True)
    mod = AttractorLayerNormed(
        n_bins=8, n_attractors=4, min_depth=1e-3, max_depth=10.0,
        alpha=1000.0, gamma=2, kind="mean", attractor_type="inv", mlp_dim=32)
    b_new, B_centers = mod.apply({"params": _seq_params(ref._net)},
                                 jnp.asarray(x), jnp.asarray(b_prev),
                                 jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(b_new), _nhwc(ref_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(B_centers), _nhwc(ref_B),
                               atol=1e-5, rtol=1e-5)


def test_conditional_log_binomial_vs_reference():
    in_feat, cond_dim, K = 24, 9, 8
    ref = RefConditionalLogBinomial(
        in_feat, cond_dim, n_classes=K, bottleneck_factor=2,
        max_temp=50.0, min_temp=1e-7).eval()
    x = _rand((2, 6, 7, in_feat), seed=10)
    cond = _rand((2, 6, 7, cond_dim), seed=11)
    with torch.no_grad():
        ref_probs = ref(_nchw(x), _nchw(cond))
    mod = ConditionalLogBinomial(
        n_classes=K, bottleneck=(in_feat + cond_dim) // 2,
        min_temp=1e-7, max_temp=50.0)
    probs = mod.apply({"params": _seq_params(ref.mlp)},
                      jnp.asarray(x), jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(probs), _nhwc(ref_probs),
                               atol=1e-5, rtol=1e-4)


def test_feature_fusion_block_vs_reference():
    feats = 16
    ref = RefFeatureFusionBlock(feats, tnn.ReLU(False), deconv=False, bn=False,
                                expand=False, align_corners=True).eval()
    x = _rand((2, 4, 5, feats), seed=12)
    skip = _rand((2, 4, 5, feats), seed=13)
    with torch.no_grad():
        ref_out = ref(_nchw(x), _nchw(skip), size=(8, 10))
    params = {
        "ResidualConvUnit_0": {"Conv_0": _conv_p(ref.resConfUnit1.conv1),
                               "Conv_1": _conv_p(ref.resConfUnit1.conv2)},
        "ResidualConvUnit_1": {"Conv_0": _conv_p(ref.resConfUnit2.conv1),
                               "Conv_1": _conv_p(ref.resConfUnit2.conv2)},
        "Conv_0": _conv_p(ref.out_conv),
    }
    out = FeatureFusionBlock(feats).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(skip), size=(8, 10))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                               atol=1e-5, rtol=1e-5)
