"""Elementary conv blocks (NHWC, flax.linen).

TPU-native equivalents of the reference's conv vocabulary
(estimator/models/blocks/convs.py): per-pixel channel LayerNorm (the
"channels_first LayerNorm" there is plain last-axis LN in NHWC), exact-erf
GELU (torch nn.GELU default), 3x3 SAME convs.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class DotLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with dot-product reductions.

    Numerically identical to ``nn.LayerNorm`` (same params: scale/bias), but
    the mean/E[x^2] reductions are expressed as matmuls with a ones vector.
    With small channel counts (32-64) at full patch resolution, XLA lowers a
    plain reduce by flipping the feature map to a W-minor layout and copying
    it back for the next conv (~200 MB per LN at 16x384x512x32 — profiled as
    25% of inference time); a dot keeps the conv layout."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        ones = jnp.ones((c, 1), jnp.float32)
        mean = jax.lax.dot_general(
            xf, ones, (((xf.ndim - 1,), (0,)), ((), ())),
            precision="highest",
        ) / c
        m2 = jax.lax.dot_general(
            xf * xf, ones, (((xf.ndim - 1,), (0,)), ((), ())),
            precision="highest",
        ) / c
        var = jnp.maximum(m2 - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def gelu(x):
    """Exact-erf GELU for float32 (torch nn.GELU parity); tanh approximation
    for bf16 compute — erf dominates VPU time at full-resolution feature maps
    (profiled at ~20 ms per fused layer on v5e) while the tanh form differs
    by <3e-3 on activations, far below bf16 rounding at these widths."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def relu(x):
    return nn.relu(x)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps=1e-6 like the reference."""

    @nn.compact
    def __call__(self, x):
        return DotLayerNorm(epsilon=1e-6, name="LayerNorm_0")(x)


class SingleConvCNNLN(nn.Module):
    """conv3x3(no bias) -> channel LN -> GELU
    (reference convs.py:65-76, kernel_size configurable for glb_att projs).

    ``s2d_split``: when set (a tuple of original part widths), the input
    is ``cat(s2d(part) for part in parts)`` and the block runs in
    space-to-depth form with an expanded kernel — exact numerics, full
    lane tiles for the C=32 full-resolution instances (ops/s2d.py)."""

    features: int
    kernel_size: int = 3
    s2d_split: tuple | None = None

    @nn.compact
    def __call__(self, x):
        from patchrefinerv2_tpu.models.blocks.dpt import (
            _ConvParams, _LayerNormParams, _conv_same,
        )
        from patchrefinerv2_tpu.ops.quant import conv_dispatch

        k = self.kernel_size
        if self.s2d_split is not None:
            from patchrefinerv2_tpu.ops import s2d as s2d_ops

            assert k == 3 and sum(self.s2d_split) * 4 == x.shape[-1]
            kern, _ = _ConvParams(
                (3, 3, sum(self.s2d_split), self.features),
                use_bias=False, name="Conv_0",
            )()
            from patchrefinerv2_tpu.ops.quant import (
                quant_skip, s2d_quant_enabled,
            )

            sconv = (
                conv_dispatch(self, x.dtype, _conv_same)
                if s2d_quant_enabled() and not quant_skip("tailfuse")
                else _conv_same
            )
            x = sconv(
                x, s2d_ops.s2d_same_kernel(kern, split=tuple(self.s2d_split)),
                None,
            )
            ln_s, ln_b = _LayerNormParams(self.features, name="LayerNorm_0")()
            return gelu(s2d_ops.layer_norm_s2d(x, ln_s, ln_b))
        # explicit Conv_0 kernel (same tree as nn.Conv) so the fusion-pair
        # convs — the 512-channel concat sites — can take the int8 path
        # (ops/quant.py, opt-in PRV2_INT8, calibrated or dynamic scales)
        kern, _ = _ConvParams((k, k, x.shape[-1], self.features),
                              use_bias=False, name="Conv_0")()
        conv = conv_dispatch(self, x.dtype, _conv_same)
        x = conv(x, kern, None)
        x = DotLayerNorm(epsilon=1e-6, name="LayerNorm_0")(x)
        return gelu(x)


class DoubleConv(nn.Module):
    """(conv3x3 no-bias -> GELU) x2 (reference convs.py:31-45).

    Params are declared explicitly (same tree as the nn.Conv pair:
    Conv_0/Conv_1, kernel only) so the convs can dispatch to the dynamic-
    int8 path (ops/quant.py, opt-in PRV2_INT8) without forking the
    checkpoint layout — the same pattern as GatedConvUnit.

    ``s2d_out``: emit the SECOND conv in space-to-depth-down form
    (ops/s2d.py ``conv_s2d_down``) so the output lands directly in s2d
    layout — exact, same param tree. Only worthwhile for the full-
    resolution low-C tail instance (f2r_agg_4: Cout=32 pads to a quarter
    tile in plain layout; the (4,4) down kernel is also 2.25x fewer
    padded FLOPs than the plain 3x3 there). The FIRST conv stays plain:
    at mid~98 channels an s2d expansion would quadruple padded FLOPs
    with no occupancy gain. The s2d branch routes through the int8
    dispatch only under PRV2_INT8_S2D=1 (ops/quant.py "s2d
    interaction")."""

    features: int
    mid_features: int | None = None
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x):
        from patchrefinerv2_tpu.models.blocks.dpt import _ConvParams, _conv_same
        from patchrefinerv2_tpu.ops.quant import conv_dispatch

        mid = self.mid_features or self.features
        k0, _ = _ConvParams((3, 3, x.shape[-1], mid), use_bias=False,
                            name="Conv_0")()
        k1, _ = _ConvParams((3, 3, mid, self.features), use_bias=False,
                            name="Conv_1")()
        conv = conv_dispatch(self, x.dtype, _conv_same)
        h = gelu(conv(x, k0, None))
        if self.s2d_out:
            from patchrefinerv2_tpu.ops import s2d as s2d_ops
            from patchrefinerv2_tpu.ops.quant import (
                quant_skip, s2d_quant_enabled,
            )

            assert h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0, h.shape
            if s2d_quant_enabled() and not quant_skip("taildc"):
                # s2d-down form as a dispatchable conv: pre-expanded (4,4)
                # stride-2 kernel, explicit (1,1) pads (ops/s2d.py
                # conv_s2d_down numerics)
                # distinct prefix: this module already owns a dispatcher
                # for the plain first conv (site-name collision otherwise)
                dconv = conv_dispatch(
                    self, x.dtype, s2d_ops.conv_down_expanded,
                    strides=(2, 2), padding=((1, 1), (1, 1)), prefix="qsd",
                )
                return gelu(dconv(h, s2d_ops.s2d_down_kernel(k1), None))
            return gelu(s2d_ops.conv_s2d_down(h, k1, None))
        return gelu(conv(h, k1, None))


class DoubleResConv(nn.Module):
    """Residual pair: x + act(conv(act(conv(x))))
    (reference convs.py:47-62: two conv->act stages with an outer skip)."""

    features: int
    activation: Callable = gelu

    @nn.compact
    def __call__(self, x):
        out = self.activation(nn.Conv(self.features, (3, 3), use_bias=False)(x))
        out = self.activation(nn.Conv(self.features, (3, 3), use_bias=False)(out))
        return x + out


class ResidualConvUnit(nn.Module):
    """DPT residual unit: x + conv(act(conv(act(x))))
    (external/depth_anything/blocks.py:37-96, bn=False in all live configs)."""

    features: int
    activation: Callable = relu

    @nn.compact
    def __call__(self, x):
        out = self.activation(x)
        out = nn.Conv(self.features, (3, 3), use_bias=True)(out)
        out = self.activation(out)
        out = nn.Conv(self.features, (3, 3), use_bias=True)(out)
        return out + x


class MLP(nn.Module):
    """1x1-conv MLP used by bins-head subnets: conv1x1 -> act -> conv1x1 [-> act]."""

    hidden: int
    out: int
    act: Callable = relu
    final_act: Callable | None = None

    @nn.compact
    def __call__(self, x):
        x = self.act(nn.Conv(self.hidden, (1, 1))(x))
        x = nn.Conv(self.out, (1, 1))(x)
        if self.final_act is not None:
            x = self.final_act(x)
        return x
