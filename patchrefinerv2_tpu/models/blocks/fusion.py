"""Fusion heads: BiDirectionalFusion (V2) and FusionUnet (V1).

Capability match:
* FusionUnet + UpSample — estimator/models/blocks/fusion_model.py:7-123
  (per-level SingleConvCNNLN encode of concat(coarse, fine) + preds,
  upsample-concat DoubleConv decoder, 3x3 offset conv).
* BiDirectionalFusion — estimator/models/blocks/
  bi_directional_fusion_model.py:289-446: optional coarse2fine module
  (self-agg / coarse-gated / coarse-fusion C2FModule, only-gate
  C2FNOENCModule) rewrites the fine pyramid and pred2, then the fine2coarse
  UNet produces the final offset; update_base + offset clamped >= 0.

Feature list convention here matches the reference call sites: ``c_feat``
and ``f_feat`` are high-resolution-first lists of ``fusion_feat_level``
maps (NHWC); ``pred1``/``pred2`` are (B, h, w, 1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.models.blocks.convs import DoubleConv, SingleConvCNNLN
from patchrefinerv2_tpu.models.blocks.dpt import C2FModule, C2FNOENCModule
from patchrefinerv2_tpu.ops.resize import resize


def _interp(x, size):
    return resize(x, size, mode="bilinear", align_corners=True)


class UpSample(nn.Module):
    """Upscale-concat-DoubleConv decoder stage (fusion_model.py:7-35)."""

    out_ch: int
    mid_ch: int

    @nn.compact
    def __call__(self, x1, x2, pred1, pred2):
        size = x2.shape[1:3]
        x1 = _interp(x1, size)
        pred1 = _interp(pred1, size)
        pred2 = _interp(pred2, size)

        from patchrefinerv2_tpu.ops.fused_f2r import (
            fused_dc_supported,
            fused_upsample_dc,
        )

        if (
            not self.is_initializing()
            and x1.shape[-1] + x2.shape[-1] + 2 == self.mid_ch
            and fused_dc_supported(x1.shape, x2.shape[-1], self.out_ch, x1.dtype)
        ):
            # fused concat+DoubleConv (ops/fused_f2r.py, opt-in
            # PRV2_FUSED_DC); the upsample stays an XLA resize matmul
            kC, kD = _DoubleConvParams(
                ((3, 3, self.mid_ch, self.mid_ch),
                 (3, 3, self.mid_ch, self.out_ch)),
                name="DoubleConv_0",
            )()
            return fused_upsample_dc(x1, x2, pred1, pred2, kC, kD)

        x = jnp.concatenate([x1, x2, pred1, pred2], axis=-1)
        return DoubleConv(self.out_ch, self.mid_ch)(x)


class _DoubleConvParams(nn.Module):
    """Parameter-only mirror of DoubleConv (Conv_0, Conv_1; no biases)."""

    kshapes: tuple

    @nn.compact
    def __call__(self):
        from patchrefinerv2_tpu.models.blocks.dpt import _ConvParams

        k0, _ = _ConvParams(self.kshapes[0], use_bias=False, name="Conv_0")()
        k1, _ = _ConvParams(self.kshapes[1], use_bias=False, name="Conv_1")()
        return k0, k1


class _CNNLNParams(nn.Module):
    """Parameter-only mirror of SingleConvCNNLN (Conv_0 kernel +
    LayerNorm_0 scale/bias) for fused-kernel dispatch: same tree, caller
    owns the computation."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        from patchrefinerv2_tpu.models.blocks.dpt import (
            _ConvParams,
            _LayerNormParams,
        )

        k, _ = _ConvParams((3, 3, self.cin, self.features), use_bias=False,
                           name="Conv_0")()
        s, b = _LayerNormParams(self.features, name="LayerNorm_0")()
        return k, (s, b)


class _UpSampleParams(nn.Module):
    """Parameter-only mirror of UpSample's DoubleConv (DoubleConv_0/Conv_0,
    DoubleConv_0/Conv_1)."""

    out_ch: int
    mid_ch: int
    cin: int

    @nn.compact
    def __call__(self):
        return _DoubleConvParams(
            ((3, 3, self.cin, self.mid_ch), (3, 3, self.mid_ch, self.out_ch)),
            name="DoubleConv_0",
        )()


@MODELS.register_module()
class FusionUnet(nn.Module):
    """V1 offset head (fusion_model.py:52-123)."""

    input_chl: Sequence[int] = (64, 512, 512)
    temp_chl: Sequence[int] = (32, 256, 256)
    dec_chl: Sequence[int] = (256, 32)
    glb_att: bool = False  # parity with BiDirectionalFusion interface

    @nn.compact
    def __call__(self, c_feat, f_feat, pred1, pred2, update_base=None,
                 return_feat=False, **_):
        temp_feats = []
        for idx, (c, f) in enumerate(zip(c_feat, f_feat)):
            h = SingleConvCNNLN(self.temp_chl[idx], name=f"enc1_{idx}")(
                jnp.concatenate([c, f], axis=-1)
            )
            p1 = _interp(pred1, h.shape[1:3])
            p2 = _interp(pred2, h.shape[1:3])
            h = SingleConvCNNLN(self.temp_chl[idx], name=f"enc2_{idx}")(
                jnp.concatenate([h, p1, p2], axis=-1)
            )
            temp_feats.append(h)

        rev = temp_feats[::-1]
        cur = rev[0]
        mids = list(self.temp_chl)[::-1]
        in_mid = mids[0]
        for idx, (feat, dec_c) in enumerate(zip(rev[1:], self.dec_chl)):
            mid = mids[idx + 1] + in_mid + 2
            cur = UpSample(dec_c, mid, name=f"dec_{idx}")(cur, feat, pred1, pred2)
            in_mid = dec_c

        offset = nn.Conv(1, (3, 3), use_bias=False, name="final_conv")(cur)
        out = jnp.maximum(update_base + offset, 0.0) if update_base is not None else offset
        if return_feat:
            return out, cur
        return out


@MODELS.register_module()
class BiDirectionalFusion(nn.Module):
    """V2 fusion head (bi_directional_fusion_model.py:289-446)."""

    encoder_name: str = ""
    coarse2fine: bool = True
    coarse2fine_type: str = "coarse-gated"
    fine2coarse: bool = True
    coarse_chl: Sequence[int] = (32, 256, 256, 256, 256, 256)
    fine_chl: Sequence[int] = (24, 40, 64, 176, 512)
    fine_chl_after_coarse2fine: Sequence[int] = (32, 256, 256, 256, 256, 256)
    temp_chl: Sequence[int] = (32, 64, 64, 128, 256, 512)
    dec_chl: Sequence[int] = (512, 256, 128, 64, 32)
    glb_att: bool = False
    att_dim: int = 256
    select_feat_index: Sequence[int] = (-1,)
    pe_type: str = "none"
    c2f_features: int = 256  # C2F decoder width (reference hardcodes 256)

    @nn.compact
    def __call__(
        self,
        c_feat,
        f_feat,
        pred1,
        pred2,
        update_base=None,
        pe_list=None,
        pe_patch_list=None,
        return_feat=False,
    ):
        c_feat = list(c_feat)
        f_feat = list(f_feat)

        # align coarse levels onto the fine grid when processing shapes
        # differ (bi_directional_fusion_model.py:389-393 checks only the last
        # level; we align per-level — identical where the reference works,
        # robust when intermediate pyramids disagree)
        c_feat = [
            _interp(c, f.shape[1:3]) if c.shape[1:3] != f.shape[1:3] else c
            for c, f in zip(c_feat, f_feat)
        ]

        if self.glb_att:
            # TwoWayTransformer cross-attention between selected fine levels
            # (queries, + roi'd PE) and coarse levels (keys, + whole PE)
            # (bi_directional_fusion_model.py:337-363,395-404)
            from patchrefinerv2_tpu.models.blocks.transformers import TwoWayTransformer

            for idx, i in enumerate(self.select_feat_index):
                sel_c = SingleConvCNNLN(self.att_dim, kernel_size=1, name=f"feat_proj_coarse_{idx}")(c_feat[i])
                sel_f = SingleConvCNNLN(self.att_dim, kernel_size=1, name=f"feat_proj_fine_{idx}")(f_feat[i])
                pe = pe_list[::-1][i]
                pe_patch = pe_patch_list[::-1][i]
                fine_update, _ = TwoWayTransformer(
                    depth=2,
                    embedding_dim=self.att_dim,
                    num_heads=8,
                    mlp_dim=1024,
                    attention_downsample_rate=2,
                    name=f"att_block_{idx}",
                )(sel_f, pe_patch, sel_c, pe)
                f_feat[i] = jnp.concatenate([f_feat[i], fine_update], axis=-1)

        if self.coarse2fine:
            fine5 = f_feat[1:]  # drop duplicated top level
            gate = self.coarse2fine_type == "coarse-gated"
            fusion = self.coarse2fine_type in ("coarse-gated", "coarse-fusion", "only-gate")
            if self.coarse2fine_type == "only-gate":
                c2f_feats, out_depth = C2FNOENCModule(
                    features=self.c2f_features, gate=False, fusion=True, name="c2f"
                )(fine5, c_feat)
            else:
                c2f_feats, out_depth = C2FModule(
                    features=self.c2f_features,
                    head2_features=self.coarse_chl[0],
                    gate=gate,
                    fusion=fusion,
                    name="c2f",
                )(fine5, c_feat)
            f_feat = c2f_feats[::-1]  # high-res first
            pred2 = out_depth

        # fused full-res tail (ops/fused_f2r.py, opt-in PRV2_FUSED_F2R):
        # level-0 fusion pair + last UpSample DoubleConv + final_conv +
        # clamp in one Pallas pass. Inference-only (return_feat needs the
        # pre-final feature, and the kernel has no VJP).
        from patchrefinerv2_tpu.ops.fused_f2r import (
            fused_f2r_supported,
            fused_f2r_tail,
        )

        full_hw = c_feat[0].shape[1:3]
        n_levels = len(c_feat)
        # the last UpSample's input: previous decoder feature (dec_chl[-2],
        # or the deepest temp feature when the decoder is a single stage)
        # concat level-0 fusion feature + 2 preds
        tail_mid_in = (
            self.dec_chl[-2] if len(self.dec_chl) >= 2 else self.temp_chl[-1]
        ) + self.temp_chl[0] + 2
        fuse_tail = (
            not return_feat
            and not self.is_initializing()
            and n_levels == len(self.dec_chl) + 1
            and f_feat[0].shape[1:3] == full_hw
            and pred1.shape[1:3] == full_hw
            and pred2.shape[1:3] == full_hw
            and fused_f2r_supported(
                c_feat[0].shape,
                c_feat[0].shape[-1],
                f_feat[0].shape[-1],
                self.temp_chl[0],
                tail_mid_in,
                self.dec_chl[-1],
                c_feat[0].dtype,
            )
        )

        from patchrefinerv2_tpu.ops.fused_f2r import (
            fused_fusion_pair,
            fused_pair_supported,
        )

        temp_feats = []
        for idx, (c, f) in enumerate(zip(c_feat, f_feat)):
            if idx == 0 and fuse_tail:
                temp_feats.append(None)  # consumed inside the fused tail
                continue
            if (
                idx > 0
                and not return_feat
                and not self.is_initializing()
                and c.shape[1:3] == f.shape[1:3]
                and fused_pair_supported(
                    c.shape, f.shape[-1], self.temp_chl[idx], c.dtype
                )
            ):
                # fused conv+LN+gelu pair (ops/fused_f2r.py, opt-in
                # PRV2_FUSED_PAIR) — the per-level cat never materializes
                kA, lnA = _CNNLNParams(
                    self.temp_chl[idx], c.shape[-1] + f.shape[-1],
                    name=f"fusion1_{idx}",
                )()
                kB, lnB = _CNNLNParams(
                    self.temp_chl[idx], self.temp_chl[idx] + 2,
                    name=f"fusion2_{idx}",
                )()
                p1 = _interp(pred1, c.shape[1:3])
                p2 = _interp(pred2, c.shape[1:3])
                temp_feats.append(
                    fused_fusion_pair(c, f, p1, p2, kA, lnA, kB, lnB)
                )
                continue
            h = SingleConvCNNLN(self.temp_chl[idx], name=f"fusion1_{idx}")(
                jnp.concatenate([c, f], axis=-1)
            )
            p1 = _interp(pred1, h.shape[1:3])
            p2 = _interp(pred2, h.shape[1:3])
            h = SingleConvCNNLN(self.temp_chl[idx], name=f"fusion2_{idx}")(
                jnp.concatenate([h, p1, p2], axis=-1)
            )
            temp_feats.append(h)

        rev = temp_feats[::-1]  # low-res first
        cur = rev[0]
        mids = list(self.temp_chl)[::-1]
        in_mid = mids[0]
        n_dec = len(self.dec_chl) - (1 if fuse_tail else 0)
        for idx in range(n_dec):
            feat, dec_c = rev[1 + idx], self.dec_chl[idx]
            mid = mids[idx + 1] + in_mid + 2
            cur = UpSample(dec_c, mid, name=f"f2r_agg_{idx}")(cur, feat, pred1, pred2)
            in_mid = dec_c

        if fuse_tail:
            tc = self.temp_chl[0]
            kA, lnA = _CNNLNParams(
                tc, c_feat[0].shape[-1] + f_feat[0].shape[-1], name="fusion1_0"
            )()
            kB, lnB = _CNNLNParams(tc, tc + 2, name="fusion2_0")()
            mid = tc + in_mid + 2
            kC, kD = _UpSampleParams(
                self.dec_chl[-1], mid, mid, name=f"f2r_agg_{len(self.dec_chl) - 1}"
            )()
            from patchrefinerv2_tpu.models.blocks.dpt import _ConvParams

            kE, _ = _ConvParams(
                (3, 3, self.dec_chl[-1], 1), use_bias=False, name="final_conv"
            )()
            x1up = _interp(cur, full_hw)
            return fused_f2r_tail(
                c_feat[0], f_feat[0], pred1, pred2, x1up, update_base,
                kA, lnA, kB, lnB, kC, kD, kE,
            )

        offset = nn.Conv(1, (3, 3), use_bias=False, name="final_conv")(cur)
        out = jnp.maximum(update_base + offset, 0.0) if update_base is not None else offset
        if return_feat:
            # the reference's distillation hook point: the input to
            # final_conv (patchrefiner_semi.py:102-103, last_feat=True)
            return out, cur
        return out


class SingleConvCNNLNHeavy(nn.Module):
    """conv-LN-conv-LN-conv-GELU (bi_directional_fusion_model.py:449-463)."""

    features: int

    @nn.compact
    def __call__(self, x):
        from patchrefinerv2_tpu.models.blocks.convs import DotLayerNorm, gelu

        x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
        x = DotLayerNorm(epsilon=1e-6, name="LayerNorm_0")(x)
        x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
        x = DotLayerNorm(epsilon=1e-6, name="LayerNorm_1")(x)
        x = nn.Conv(self.features, (3, 3), use_bias=False)(x)
        return gelu(x)


class DoubleConvHeavy(nn.Module):
    """(conv3x3 no-bias -> GELU) x5 (bi_directional_fusion_model.py:465-485)."""

    features: int
    mid_features: int | None = None

    @nn.compact
    def __call__(self, x):
        from patchrefinerv2_tpu.models.blocks.convs import gelu

        mid = self.mid_features or self.features
        for _ in range(4):
            x = gelu(nn.Conv(mid, (3, 3), use_bias=False)(x))
        return gelu(nn.Conv(self.features, (3, 3), use_bias=False)(x))


class UpSampleHeavy(nn.Module):
    """Upscale-concat-DoubleConvHeavy (bi_directional_fusion_model.py:488-516)."""

    out_ch: int
    mid_ch: int

    @nn.compact
    def __call__(self, x1, x2, pred1, pred2):
        size = x2.shape[1:3]
        x1 = _interp(x1, size)
        pred1 = _interp(pred1, size)
        pred2 = _interp(pred2, size)
        x = jnp.concatenate([x1, x2, pred1, pred2], axis=-1)
        return DoubleConvHeavy(self.out_ch, self.mid_ch)(x)


@MODELS.register_module()
class BiDirectionalFusionHeavy(BiDirectionalFusion):
    """Heavy-conv variant (bi_directional_fusion_model.py:518-675): same
    dataflow as BiDirectionalFusion with heavier per-level encoders and a
    heavier decoder."""

    @nn.compact
    def __call__(
        self,
        c_feat,
        f_feat,
        pred1,
        pred2,
        update_base=None,
        pe_list=None,
        pe_patch_list=None,
        return_feat=False,
    ):
        c_feat = list(c_feat)
        f_feat = list(f_feat)
        c_feat = [
            _interp(c, f.shape[1:3]) if c.shape[1:3] != f.shape[1:3] else c
            for c, f in zip(c_feat, f_feat)
        ]

        if self.glb_att:
            from patchrefinerv2_tpu.models.blocks.transformers import TwoWayTransformer

            for idx, i in enumerate(self.select_feat_index):
                sel_c = SingleConvCNNLN(self.att_dim, kernel_size=1, name=f"feat_proj_coarse_{idx}")(c_feat[i])
                sel_f = SingleConvCNNLN(self.att_dim, kernel_size=1, name=f"feat_proj_fine_{idx}")(f_feat[i])
                pe = pe_list[::-1][i]
                pe_patch = pe_patch_list[::-1][i]
                fine_update, _ = TwoWayTransformer(
                    depth=2, embedding_dim=self.att_dim, num_heads=8, mlp_dim=1024,
                    attention_downsample_rate=2, name=f"att_block_{idx}",
                )(sel_f, pe_patch, sel_c, pe)
                f_feat[i] = jnp.concatenate([f_feat[i], fine_update], axis=-1)

        if self.coarse2fine:
            fine5 = f_feat[1:]
            gate = self.coarse2fine_type == "coarse-gated"
            fusion = self.coarse2fine_type in ("coarse-gated", "coarse-fusion", "only-gate")
            if self.coarse2fine_type == "only-gate":
                c2f_feats, out_depth = C2FNOENCModule(
                    features=self.c2f_features, gate=False, fusion=True, name="c2f"
                )(fine5, c_feat)
            else:
                c2f_feats, out_depth = C2FModule(
                    features=self.c2f_features,
                    head2_features=self.coarse_chl[0],
                    gate=gate,
                    fusion=fusion,
                    name="c2f",
                )(fine5, c_feat)
            f_feat = c2f_feats[::-1]
            pred2 = out_depth

        temp_feats = []
        for idx, (c, f) in enumerate(zip(c_feat, f_feat)):
            h = SingleConvCNNLNHeavy(self.temp_chl[idx], name=f"fusion1_{idx}")(
                jnp.concatenate([c, f], axis=-1)
            )
            p1 = _interp(pred1, h.shape[1:3])
            p2 = _interp(pred2, h.shape[1:3])
            h = SingleConvCNNLNHeavy(self.temp_chl[idx], name=f"fusion2_{idx}")(
                jnp.concatenate([h, p1, p2], axis=-1)
            )
            temp_feats.append(h)

        rev = temp_feats[::-1]
        cur = rev[0]
        mids = list(self.temp_chl)[::-1]
        in_mid = mids[0]
        for idx, (feat, dec_c) in enumerate(zip(rev[1:], self.dec_chl)):
            mid = mids[idx + 1] + in_mid + 2
            cur = UpSampleHeavy(dec_c, mid, name=f"f2r_agg_{idx}")(cur, feat, pred1, pred2)
            in_mid = dec_c

        offset = nn.Conv(1, (3, 3), use_bias=False, name="final_conv")(cur)
        out = jnp.maximum(update_base + offset, 0.0) if update_base is not None else offset
        if return_feat:
            return out, cur
        return out
