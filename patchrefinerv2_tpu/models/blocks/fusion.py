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
    """Upscale-concat-DoubleConv decoder stage (fusion_model.py:7-35).

    ``s2d_out``: return the stage output in space-to-depth layout (the
    DoubleConv's second conv runs in s2d-down form — exact; see
    DoubleConv). Used only for the final full-resolution stage by a
    caller that owns matching s2d consumers."""

    out_ch: int
    mid_ch: int
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x1, x2, pred1, pred2):
        size = x2.shape[1:3]
        x1 = _interp(x1, size)
        pred1 = _interp(pred1, size)
        pred2 = _interp(pred2, size)
        x = jnp.concatenate([x1, x2, pred1, pred2], axis=-1)
        return DoubleConv(self.out_ch, self.mid_ch, s2d_out=self.s2d_out)(x)


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

        # full-resolution C=32 tail in space-to-depth form (exact layout
        # change, ops/s2d.py): this variant opts in via C2FModule's
        # explicit ``s2d_tail`` and owns the matching consumers — the
        # fusion1_0/fusion2_0 convs read last_feat (= f_feat[0]) in s2d
        # form and only the f2r_agg_4 input converts back. Same
        # parameters, 4x lane occupancy. Engagement is re-derived from
        # the RETURNED last_feat shape (half the resolution of pred2)
        # so C2F's odd-size fallback can never desynchronize the two
        # sides (ADVICE r3, medium).
        from patchrefinerv2_tpu.ops import s2d as s2d_ops

        want_s2d = (
            s2d_ops.s2d_enabled()
            and self.coarse2fine
            and self.coarse2fine_type != "only-gate"
        )
        tail_s2d = False

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
                    s2d_tail=want_s2d,
                    name="c2f",
                )(fine5, c_feat)
            f_feat = c2f_feats[::-1]  # high-res first
            pred2 = out_depth
            tail_s2d = want_s2d and (
                f_feat[0].shape[1] == out_depth.shape[1] // 2
            )

        temp_feats = []
        for idx, (c, f) in enumerate(zip(c_feat, f_feat)):
            if idx == 0 and tail_s2d:
                # f (= c2f last_feat) is already s2d; lift the coarse
                # level and the two 1-channel predictions to match
                h = SingleConvCNNLN(
                    self.temp_chl[0], name="fusion1_0",
                    s2d_split=(c.shape[-1], f.shape[-1] // 4),
                )(jnp.concatenate([s2d_ops.space_to_depth(c), f], axis=-1))
                p1s = s2d_ops.space_to_depth(_interp(pred1, c.shape[1:3]))
                p2s = s2d_ops.space_to_depth(_interp(pred2, c.shape[1:3]))
                h = SingleConvCNNLN(
                    self.temp_chl[0], name="fusion2_0",
                    s2d_split=(self.temp_chl[0], 1, 1),
                )(jnp.concatenate([h, p1s, p2s], axis=-1))
                temp_feats.append(s2d_ops.depth_to_space(h))
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
        last = len(self.dec_chl) - 1
        cur_s2d = False
        for idx in range(len(self.dec_chl)):
            feat, dec_c = rev[1 + idx], self.dec_chl[idx]
            mid = mids[idx + 1] + in_mid + 2
            # final full-res stage: emit in s2d layout so final_conv (the
            # only consumer) reads full lane tiles — skipped when the
            # caller needs the plain-layout distillation feature
            # (return_feat) or the full-res dims are odd
            stage_s2d = (
                idx == last
                and s2d_ops.s2d_enabled()
                and not return_feat
                and feat.shape[1] % 2 == 0
                and feat.shape[2] % 2 == 0
            )
            cur = UpSample(dec_c, mid, s2d_out=stage_s2d,
                           name=f"f2r_agg_{idx}")(cur, feat, pred1, pred2)
            in_mid = dec_c
            cur_s2d = stage_s2d

        # Cout=1 3x3 convs run ~10x below HBM peak (lane tiles are
        # 128-wide); running final_conv in s2d form emits the 4 phase
        # groups as 4 output channels instead — exact (ops/s2d.py)
        from patchrefinerv2_tpu.models.blocks.dpt import _ConvParams, _conv_same

        if cur_s2d:
            kf, _ = _ConvParams((3, 3, cur.shape[-1] // 4, 1), use_bias=False,
                                name="final_conv")()
            offset = s2d_ops.depth_to_space(
                _conv_same(cur, s2d_ops.s2d_same_kernel(kf), None)
            )
        elif (s2d_ops.s2d_enabled()
                and cur.shape[1] % 2 == 0 and cur.shape[2] % 2 == 0):
            kf, _ = _ConvParams((3, 3, cur.shape[-1], 1), use_bias=False,
                                name="final_conv")()
            offset = s2d_ops.depth_to_space(s2d_ops.conv_s2d_down(cur, kf, None))
        else:
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
