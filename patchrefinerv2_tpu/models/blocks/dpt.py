"""DPT-style decoder blocks (NHWC): feature fusion, gated fusion, scratch
projections, and the SimpleDPTHead / C2F modules built from them.

Reference behavior:
* FeatureFusionBlock / ResidualConvUnit — external/depth_anything/blocks.py
  (plain softmax of skip-add, bilinear align_corners=True upsample, 1x1 out
  conv),
* GatedConvUnit / GatedFusionBlock — estimator/models/blocks/
  bi_directional_fusion_model.py:26-146 (coarse features injected through a
  sigmoid gate or a plain fusion conv),
* _make_scratch_simple 5-level 3x3 projections — estimator/models/blocks/
  lightweight_refiner.py:15-47,
* SimpleDPTHead — lightweight_refiner.py:61-137,
* C2FModule / C2FNOENCModule — bi_directional_fusion_model.py:148-286.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.convs import ResidualConvUnit, gelu, relu
from patchrefinerv2_tpu.ops.resize import resize


def upsample_bilinear_ac(x, size=None, scale=2):
    h, w = x.shape[1:3]
    target = size if size is not None else (h * scale, w * scale)
    return resize(x, target, mode="bilinear", align_corners=True)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv``: same names (kernel/bias),
    shapes, and initializers, so checkpoints/converters see an identical
    tree while the caller owns the computation (dynamic-int8 dispatch)."""

    kshape: tuple  # (kh, kw, cin, cout)
    use_bias: bool = True
    kernel_init: object = None  # default: nn.Conv's lecun_normal

    @nn.compact
    def __call__(self):
        init = self.kernel_init or nn.initializers.lecun_normal()
        k = self.param("kernel", init, self.kshape)
        b = (
            self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
            if self.use_bias
            else None
        )
        return k, b


class _LayerNormParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` (scale/bias)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


def _conv_same(x, kernel, bias):
    """``nn.Conv(..., padding='SAME')`` numerics with caller-owned params
    (flax promotes input/params to a common dtype, adds bias post-conv)."""
    dtype = jnp.promote_types(x.dtype, kernel.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _layer_norm(x, scale, bias, eps=1e-6):
    """``nn.LayerNorm(epsilon=eps)`` numerics (f32 fast-variance stats, flax
    op order, output cast to the promoted input/param dtype)."""
    out_dtype = jnp.promote_types(x.dtype, scale.dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mean) * mul + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class GatedConvUnit(nn.Module):
    """Residual conv with optional coarse-feature gating
    (bi_directional_fusion_model.py:26-82).

    out = x + conv(act(x)); if fusion: f = fusion_conv(cat(out, c_feat));
    gate => out *= sigmoid(f), else out = f.

    Params are declared explicitly (same tree as the previous nn.Conv/
    nn.LayerNorm composition: Conv_0, Conv_1, LayerNorm_0, Conv_2) so the
    hot instances can dispatch through the dynamic-int8 conv path without
    forking the checkpoint layout.

    With ``s2d=True``, ``x`` and ``c_feat`` arrive in space-to-depth form
    (ops/s2d.py) and the stored kernels are expanded with structural
    zeros at apply time — exact numerics, 4x lane occupancy for the
    C=32 full-resolution head instance (the checkpoint tree is
    unchanged; the transform is a view of the same parameters).
    """

    features: int
    gate: bool = True
    fusion: bool = True
    s2d: bool = False
    # False excludes this instance's convs from int8 quantization — set on
    # the depth-adjacent C2F head instances, where quantization measurably
    # fattens the depth-error tail (docs/performance.md round-5 accuracy)
    quant_ok: bool = True

    @nn.compact
    def __call__(self, x, c_feat=None):
        cin = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        k1, b1 = _ConvParams((3, 3, cin, self.features), name="Conv_0")()
        if self.s2d:
            from patchrefinerv2_tpu.ops import s2d as s2d_ops
            from patchrefinerv2_tpu.ops.quant import (
                conv_dispatch, s2d_quant_enabled,
            )

            # PRV2_INT8_S2D: the expanded-kernel convs take the int8 path
            # too (structural zeros quantize to 0; same per-cout grid)
            sconv = (
                conv_dispatch(self, x.dtype, _conv_same)
                if s2d_quant_enabled() and self.quant_ok
                else _conv_same
            )
            out = sconv(
                relu(x), s2d_ops.s2d_same_kernel(k1), s2d_ops.tile_bias(b1)
            ) + x
            if not self.fusion:
                return out
            cc = c_feat.shape[-1] // 4
            k2, b2 = _ConvParams(
                (3, 3, self.features + cc, self.features), name="Conv_1"
            )()
            ln_s, ln_b = _LayerNormParams(self.features, name="LayerNorm_0")()
            k3, _ = _ConvParams(
                (1, 1, self.features, self.features), use_bias=False,
                name="Conv_2",
            )()
            fused = sconv(
                jnp.concatenate([out, c_feat], axis=-1),
                s2d_ops.s2d_same_kernel(k2, split=(self.features, cc)),
                s2d_ops.tile_bias(b2),
            )
            fused = s2d_ops.layer_norm_s2d(fused, ln_s, ln_b)
            fused = sconv(relu(fused), s2d_ops.s2d_1x1_kernel(k3), None)
            if self.gate:
                return out * nn.sigmoid(fused)
            return fused
        if not self.fusion:
            return _conv_same(relu(x), k1, b1) + x

        cc = c_feat.shape[-1]
        k2, b2 = _ConvParams(
            (3, 3, self.features + cc, self.features), name="Conv_1"
        )()
        ln_s, ln_b = _LayerNormParams(self.features, name="LayerNorm_0")()
        k3, _ = _ConvParams(
            (1, 1, self.features, self.features), use_bias=False, name="Conv_2"
        )()

        # opt-in int8 path for the FLOP-sink convs (ops/quant.py,
        # PRV2_INT8=1, calibrated or dynamic scales; ~1e-2 rel error —
        # excluded from the parity bar and the default bench)
        from patchrefinerv2_tpu.ops.quant import conv_dispatch

        conv = (
            conv_dispatch(self, x.dtype, _conv_same)
            if self.quant_ok
            else _conv_same
        )
        out = conv(relu(x), k1, b1) + x
        fused = conv(jnp.concatenate([out, c_feat], axis=-1), k2, b2)
        fused = _layer_norm(fused, ln_s, ln_b)
        fused = conv(relu(fused), k3, None)
        if self.gate:
            return out * nn.sigmoid(fused)
        return fused


class GatedFusionBlock(nn.Module):
    """Fusion block with gated units (bi_directional_fusion_model.py:85-146).

    ``s2d=True`` (only valid with ``upscale=False``, the full-resolution
    head instance): inputs/outputs in space-to-depth form — see
    GatedConvUnit."""

    features: int
    gate: bool = True
    fusion: bool = True
    s2d: bool = False
    quant_ok: bool = True  # see GatedConvUnit

    @nn.compact
    def __call__(self, x, skip=None, size=None, coarse_feat=None, upscale=True):
        out = x
        if skip is not None:
            res = GatedConvUnit(self.features, self.gate, self.fusion,
                                s2d=self.s2d, quant_ok=self.quant_ok
                                )(skip, coarse_feat)
            out = out + res
        out = GatedConvUnit(self.features, self.gate, self.fusion,
                            s2d=self.s2d, quant_ok=self.quant_ok
                            )(out, coarse_feat)
        if self.s2d:
            assert not upscale
            from patchrefinerv2_tpu.ops import s2d as s2d_ops

            k, b = _ConvParams(
                (1, 1, self.features, self.features), name="Conv_0"
            )()
            return _conv_same(
                out, s2d_ops.s2d_1x1_kernel(k), s2d_ops.tile_bias(b)
            )
        if upscale:
            out = upsample_bilinear_ac(out, size=size)
        return nn.Conv(self.features, (1, 1), use_bias=True)(out)


class FeatureFusionBlock(nn.Module):
    """Plain DPT fusion block (external/depth_anything/blocks.py:99-150)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, size=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features)(skip)
        out = ResidualConvUnit(self.features)(out)
        out = upsample_bilinear_ac(out, size=size)
        return nn.Conv(self.features, (1, 1), use_bias=True)(out)


class Scratch(nn.Module):
    """Per-level 3x3 no-bias projections to a common width
    (lightweight_refiner.py:15-47; 4-level variant in depth_anything/blocks.py)."""

    features: int
    num_levels: int = 5

    @nn.compact
    def __call__(self, levels: Sequence[jnp.ndarray]):
        assert len(levels) == self.num_levels
        return [
            nn.Conv(self.features, (3, 3), use_bias=False, name=f"layer{i+1}_rn")(lvl)
            for i, lvl in enumerate(levels)
        ]


class SimpleDPTHead(nn.Module):
    """5-level DPT decoder head (lightweight_refiner.py:61-137).

    Returns (feats, out): feats = [layer_5_rn, path_5, path_4, path_3,
    path_2, last_feat] (low-res -> high-res), out = 1-channel prediction.
    The final 1x1 conv weight is init'd at mean 1.0 like the reference
    (lightweight_refiner.py:111-112).
    """

    features: int = 256

    @nn.compact
    def __call__(self, out_features: Sequence[jnp.ndarray]):
        l1, l2, l3, l4, l5 = out_features
        rn = Scratch(self.features)( [l1, l2, l3, l4, l5] )
        l1rn, l2rn, l3rn, l4rn, l5rn = rn

        p5 = FeatureFusionBlock(self.features, name="refinenet5")(l5rn, size=l4rn.shape[1:3])
        p4 = FeatureFusionBlock(self.features, name="refinenet4")(p5, l4rn, size=l3rn.shape[1:3])
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(p4, l3rn, size=l2rn.shape[1:3])
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(p3, l2rn, size=l1rn.shape[1:3])
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1rn)

        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(p1)
        last_feat = relu(nn.Conv(32, (3, 3), name="output_conv2")(out))
        out = nn.Conv(
            1,
            (1, 1),
            name="output_conv3",
            kernel_init=nn.initializers.normal(stddev=1.0, dtype=jnp.float32),
            bias_init=nn.initializers.zeros,
        )(last_feat)
        # shift kernel init to mean 1.0 (reference nn.init.normal_(mean=1.0))
        return [l5rn, p5, p4, p3, p2, last_feat], out


class C2FModule(nn.Module):
    """Coarse-to-fine DPT decoder over refiner encoder features, with coarse
    features injected at every refinenet (bi_directional_fusion_model.py:148-208).

    coarse_features: list of 6, index 0 = highest-res (32ch midas_final level),
    1..5 = deeper levels; fine_features: 5 encoder levels high->low res.

    ``s2d_tail``: explicit caller opt-in to return the full-resolution
    head (feats[5] = last_feat) in space-to-depth layout (ops/s2d.py).
    Only BiDirectionalFusion's standard variant sets it — it owns the
    matching s2d consumers; every other caller (Heavy, direct use, the
    distillation/vis feature contract pinned by
    tests/test_c2f_torch_parity.py) gets the plain layout. The caller
    detects actual engagement from the returned last_feat shape
    (half-res => s2d), which also covers the odd-size fallback below.
    """

    features: int = 256
    head2_features: int = 32  # == coarse_chl[0]
    gate: bool = True
    fusion: bool = True
    s2d_tail: bool = False

    @nn.compact
    def __call__(self, fine_features, coarse_features):
        l1, l2, l3, l4, l5 = fine_features
        rn = Scratch(self.features)([l1, l2, l3, l4, l5])
        l1rn, l2rn, l3rn, l4rn, l5rn = rn
        g, f = self.gate, self.fusion

        p5 = GatedFusionBlock(self.features, g, f, name="refinenet5")(
            l5rn, size=l4rn.shape[1:3], coarse_feat=coarse_features[5]
        )
        p4 = GatedFusionBlock(self.features, g, f, name="refinenet4")(
            p5, l4rn, size=l3rn.shape[1:3], coarse_feat=coarse_features[4]
        )
        p3 = GatedFusionBlock(self.features, g, f, name="refinenet3")(
            p4, l3rn, size=l2rn.shape[1:3], coarse_feat=coarse_features[3]
        )
        p2 = GatedFusionBlock(self.features, g, f, name="refinenet2")(
            p3, l2rn, size=l1rn.shape[1:3], coarse_feat=coarse_features[2]
        )
        p1 = GatedFusionBlock(self.features, g, f, name="refinenet1")(
            p2, l1rn, coarse_feat=coarse_features[1]
        )

        # head convs through the int8 dispatcher (param tree identical to
        # nn.Conv): output_conv1 is a full-resolution 256->128 conv — one
        # of the largest single ops in the m1 frame (tools/diff_trace.py).
        # Family-gated (ops/quant.py quant_skip) for the accuracy A/B.
        from patchrefinerv2_tpu.ops.quant import conv_dispatch, quant_skip

        hconv = (
            _conv_same if quant_skip("oc1")
            else conv_dispatch(self, p1.dtype, _conv_same)
        )
        k1c, b1c = _ConvParams(
            (3, 3, p1.shape[-1], self.features // 2), name="output_conv1"
        )()
        out = hconv(p1, k1c, b1c)

        from patchrefinerv2_tpu.ops import s2d as s2d_ops

        if self.s2d_tail and out.shape[1] % 2 == 0 and out.shape[2] % 2 == 0:
            # full-resolution C<=32 head in space-to-depth form (exact;
            # ops/s2d.py header). Param tree identical to the plain path;
            # last_feat is RETURNED in s2d form — only reached when the
            # caller opted in via s2d_tail and owns matching consumers.
            k2, b2 = _ConvParams(
                (3, 3, out.shape[-1], self.head2_features), name="output_conv2"
            )()
            # output_conv2 + the 32-ch gated head are depth-adjacent and
            # traffic-bound (cout 32): quantization there buys ~0 speed —
            # family-gated via quant_skip("head")
            head_ok = not quant_skip("head")
            from patchrefinerv2_tpu.ops.quant import s2d_quant_enabled

            if head_ok and s2d_quant_enabled():
                dconv = conv_dispatch(
                    self, out.dtype, s2d_ops.conv_down_expanded,
                    strides=(2, 2), padding=((1, 1), (1, 1)), prefix="qsd",
                )
                last_feat = relu(dconv(out, s2d_ops.s2d_down_kernel(k2),
                                       s2d_ops.tile_bias(b2)))
            else:
                last_feat = relu(s2d_ops.conv_s2d_down(out, k2, b2))
            last_feat = GatedFusionBlock(
                self.head2_features, g, f, name="output_conv2_fusion",
                s2d=True, quant_ok=head_ok,
            )(
                last_feat,
                coarse_feat=s2d_ops.space_to_depth(coarse_features[0]),
                upscale=False,
            )
            k3, b3 = _ConvParams(
                (1, 1, self.head2_features, 1),
                kernel_init=_mean_one_normal_init,
                name="output_conv3",
            )()
            out = s2d_ops.depth_to_space(
                _conv_same(last_feat, s2d_ops.s2d_1x1_kernel(k3),
                           s2d_ops.tile_bias(b3))
            )
            feats = [l5rn, p5, p4, p3, p2, last_feat]
            return feats, out

        head_ok = not quant_skip("head")
        k2c, b2c = _ConvParams(
            (3, 3, out.shape[-1], self.head2_features), name="output_conv2"
        )()
        last_feat = relu((hconv if head_ok else _conv_same)(out, k2c, b2c))
        last_feat = GatedFusionBlock(self.head2_features, g, f,
                                     name="output_conv2_fusion",
                                     quant_ok=head_ok)(
            last_feat, coarse_feat=coarse_features[0], upscale=False
        )
        out = nn.Conv(
            1,
            (1, 1),
            name="output_conv3",
            kernel_init=_mean_one_normal_init,
            bias_init=nn.initializers.zeros,
        )(last_feat)
        feats = [l5rn, p5, p4, p3, p2, last_feat]
        return feats, out


def _mean_one_normal_init(key, shape, dtype=jnp.float32):
    """normal(mean=1.0, std=1.0) like the reference head init
    (bi_directional_fusion_model.py:181, patchrefinerplus.py:98)."""
    import jax

    return jax.random.normal(key, shape, dtype) + 1.0


class C2FNOENCModule(nn.Module):
    """'only-gate' C2F variant: per-level gated convs without a decoder chain
    (bi_directional_fusion_model.py:211-286)."""

    features: int = 256
    gate: bool = False
    fusion: bool = True

    @nn.compact
    def __call__(self, fine_features, coarse_features):
        l1, l2, l3, l4, l5 = fine_features
        rn = Scratch(self.features)([l1, l2, l3, l4, l5])
        l1rn, l2rn, l3rn, l4rn, l5rn = rn
        g, f = self.gate, self.fusion

        def gate_pair(x, c, width, name):
            x = GatedConvUnit(width, g, f, name=f"{name}_gate1")(x, c)
            return GatedConvUnit(width, g, f, name=f"{name}_gate2")(x, c)

        p5 = gate_pair(l5rn, coarse_features[5], self.features, "layer1")
        p4 = gate_pair(l4rn, coarse_features[4], self.features, "layer2")
        p3 = gate_pair(l3rn, coarse_features[3], self.features, "layer3")
        p2 = gate_pair(l2rn, coarse_features[2], self.features, "layer4")
        p1 = gate_pair(l1rn, coarse_features[1], self.features, "layer5")

        l0 = nn.ConvTranspose(32, (2, 2), strides=(2, 2), name="upsample_convt")(l1)
        l0 = relu(l0)
        l0 = nn.Conv(32, (3, 3), use_bias=False, name="upsample_conv")(l0)
        p0 = gate_pair(l0, coarse_features[0], 32, "layer6")

        out = nn.Conv(1, (3, 3), name="output_conv")(p0)
        return [p5, p4, p3, p2, p1, p0], out
