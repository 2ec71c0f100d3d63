"""PatchFusion (legacy, kept for parity): frozen coarse+fine ZoeDepth pair,
guided-fusion U-Net with G2L swin context, and a re-run metric-bins head on
the fused pyramid (estimator/models/patchfusion.py:56-461).

TPU-first notes: the G2L swin pass over whole-image coarse features runs
once per image in coarse_forward (the reference recomputes it per patch
chunk on patch-repeated tensors); per-chunk work is fine-branch forward +
roi + guided decode + bins head, all inside the shared scanned tiling
engine inherited from PatchRefinerPlus.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.config import ConfigDict
from patchrefinerv2_tpu.registry import MODELS, build_model
from patchrefinerv2_tpu.models.patchrefinerplus import (
    PatchRefinerPlus,
    build_coarse_branch,
)
from patchrefinerv2_tpu.models.backbones.zoedepth import (
    AttractorLayerNormed,
    AttractorLayerUnnormed,
    ConditionalLogBinomial,
    Projector,
    SeedBinRegressorNormed,
    SeedBinRegressorUnnormed,
)
from patchrefinerv2_tpu.ops.resize import resize
from patchrefinerv2_tpu.ops.roi_align import roi_align


def _interp(x, size):
    return resize(x, size, "bilinear", True)


class PFBinsHead(nn.Module):
    """Metric-bins head over the fused pyramid (patchfusion.py:301-343);
    rel_cond is zeros (:317)."""

    min_depth: float
    max_depth: float
    n_bins: int = 64
    bin_centers_type: str = "softplus"
    bin_embedding_dim: int = 128
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    n_midas_out: int = 32

    @nn.compact
    def __call__(self, fused):
        x = fused[0]
        x_blocks = fused[1:5]
        last = fused[5]
        normed = self.bin_centers_type in ("normed", "hybrid2")
        if normed:
            _, seed_centers = SeedBinRegressorNormed(
                self.n_bins, self.min_depth, self.max_depth, name="seed_bin_regressor"
            )(x)
            b_prev = (seed_centers - self.min_depth) / (self.max_depth - self.min_depth)
        else:
            _, seed_centers = SeedBinRegressorUnnormed(self.n_bins, name="seed_bin_regressor")(x)
            b_prev = seed_centers
        prev_emb = Projector(self.bin_embedding_dim, name="seed_projector")(x)
        b_centers = b_prev
        b_embedding = prev_emb
        for i, xb in enumerate(x_blocks):
            b_embedding = Projector(self.bin_embedding_dim, name=f"projector{i}")(xb)
            cls = AttractorLayerNormed if normed else AttractorLayerUnnormed
            kwargs = dict(
                n_bins=self.n_bins,
                n_attractors=self.n_attractors[i],
                alpha=self.attractor_alpha,
                gamma=self.attractor_gamma,
                kind=self.attractor_kind,
                attractor_type=self.attractor_type,
                name=f"attractor{i}",
            )
            if normed:
                kwargs.update(min_depth=self.min_depth, max_depth=self.max_depth)
            b, b_centers = cls(**kwargs)(b_embedding, b_prev, prev_emb)
            b_prev = b
            prev_emb = b_embedding
        rel_cond = jnp.zeros(last.shape[:3] + (1,), last.dtype)
        last_cat = jnp.concatenate([last, rel_cond], axis=-1)
        b_emb_up = _interp(b_embedding, last.shape[1:3])
        probs = ConditionalLogBinomial(
            self.n_bins,
            bottleneck=(self.n_midas_out + 1 + self.bin_embedding_dim) // 2,
            min_temp=self.min_temp,
            max_temp=self.max_temp,
            name="conditional_log_binomial",
        )(last_cat, b_emb_up)
        b_centers_up = _interp(b_centers, probs.shape[1:3])
        depth = jnp.sum(probs * b_centers_up, axis=-1, keepdims=True)
        return depth.astype(last.dtype)  # keep the compute dtype downstream


class PFNet(nn.Module):
    """Compute graph for PatchFusion."""

    coarse: nn.Module
    fine: nn.Module
    guided_fusion: nn.Module
    min_depth: float
    max_depth: float
    patch_process_shape: tuple[int, int]
    n_bins: int = 64
    bin_centers_type: str = "softplus"
    bin_embedding_dim: int = 128
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    n_midas_out: int = 32

    def coarse_forward(self, image_lr):
        """Returns (feats_bundle, pred): feats_bundle = raw 6 + g2l 6 (both
        low-res-first) packed in one list; everything stop-gradiented
        (patchfusion.py:112-115 freezes both branches)."""
        out = self.coarse(image_lr)
        feats = [jax.lax.stop_gradient(f) for f in out["coarse_features"]]
        pred = jax.lax.stop_gradient(out["metric_depth"])
        g2l_feats = self.guided_fusion.g2l_whole(feats)
        return feats + g2l_feats, pred

    def _roi(self, coarse_pred, coarse_feats, bboxes, box_idx):
        pph = self.patch_process_shape[0]
        rois = []
        for feat in coarse_feats:
            h, w = feat.shape[1:3]
            rois.append(roi_align(feat, bboxes, box_idx, (h, w), h / pph))
        h, w = coarse_pred.shape[1:3]
        pred_roi = roi_align(coarse_pred, bboxes, box_idx, (h, w), h / pph)
        return rois, pred_roi

    @nn.compact
    def refine_patches(self, imgs_crop, coarse_pred, feats_bundle, bboxes, train=False):
        k = len(feats_bundle) // 2
        coarse_feats = feats_bundle[:k]
        g2l_feats = feats_bundle[k:]
        idx = jnp.zeros((bboxes.shape[0],), jnp.int32) if not train else jnp.arange(
            bboxes.shape[0], dtype=jnp.int32
        )
        coarse_rois, coarse_pred_roi = self._roi(coarse_pred, coarse_feats, bboxes, idx)

        fine_out = self.fine(imgs_crop)
        fine_feats = [jax.lax.stop_gradient(f) for f in fine_out["coarse_features"]]
        fine_pred = jax.lax.stop_gradient(fine_out["metric_depth"])

        guide_cat = []
        for i, (c_roi, f_f) in enumerate(zip(coarse_rois, fine_feats)):
            if c_roi.shape[1:3] != f_f.shape[1:3]:
                c_roi = _interp(c_roi, f_f.shape[1:3])
            out_ch = self.n_midas_out if i == 5 else c_roi.shape[-1]
            guide_cat.append(
                nn.Conv(out_ch, (3, 3), name=f"fusion_conv{i}")(
                    jnp.concatenate([c_roi, f_f], axis=-1)
                )
            )

        if coarse_pred_roi.shape[1:3] != imgs_crop.shape[1:3]:
            coarse_pred_roi = _interp(coarse_pred_roi, imgs_crop.shape[1:3])
        if fine_pred.shape[1:3] != imgs_crop.shape[1:3]:
            fine_pred = _interp(fine_pred, imgs_crop.shape[1:3])
        input_tensor = jnp.concatenate([coarse_pred_roi, fine_pred, imgs_crop], axis=-1)

        fused = self.guided_fusion(
            input_tensor, None, guide_cat, bboxes, g2l_feats, train=train
        )
        return PFBinsHead(
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            n_bins=self.n_bins,
            bin_centers_type=self.bin_centers_type,
            bin_embedding_dim=self.bin_embedding_dim,
            n_attractors=tuple(self.n_attractors),
            attractor_alpha=self.attractor_alpha,
            attractor_gamma=self.attractor_gamma,
            attractor_kind=self.attractor_kind,
            attractor_type=self.attractor_type,
            min_temp=self.min_temp,
            max_temp=self.max_temp,
            n_midas_out=self.n_midas_out,
            name="bins_head",
        )(fused)

    def infer_chunk(self, imgs_crop, coarse_pred, feats_bundle, bboxes):
        return self.refine_patches(imgs_crop, coarse_pred, feats_bundle, bboxes, train=False)

    def train_forward(self, image_lr, crops_image_hr, bboxs, train: bool = True):
        feats_bundle, coarse_pred = self.coarse_forward(image_lr)
        # training rois index into the per-sample batch
        depth = self.refine_patches(crops_image_hr, coarse_pred, feats_bundle, bboxs, train=train)
        return depth, coarse_pred


@MODELS.register_module()
class PatchFusion(PatchRefinerPlus):
    """Config-built orchestrator reusing the PatchRefinerPlus tiling engine
    (estimator/models/patchfusion.py config surface: coarse_branch,
    fine_branch, guided_fusion, sigloss)."""

    def __init__(self, config: dict):
        cfg = ConfigDict(ConfigDict._wrap(config))
        cfg.setdefault("pretrain_stage", False)
        cfg.setdefault("e2e_training", False)
        cfg.setdefault("sigweight", 1.0)
        cfg.setdefault("strategy_refiner_target", "direct")
        cfg.setdefault("gmloss", {"type": "GradMatchLoss"})

        coarse_cfg = ConfigDict(ConfigDict._wrap(cfg.coarse_branch))
        fine_cfg = ConfigDict(ConfigDict._wrap(cfg.fine_branch))
        coarse_mod, resizer_kind = build_coarse_branch(coarse_cfg, cfg.min_depth, cfg.max_depth)
        fine_mod, _ = build_coarse_branch(fine_cfg, cfg.min_depth, cfg.max_depth)
        gf_cfg = dict(cfg.guided_fusion)
        gf_cfg.setdefault("patch_process_shape", list(cfg.patch_process_shape))
        guided = build_model(gf_cfg)

        parent_cfg = cfg.to_dict()
        parent_cfg["refiner"] = dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=False,
                with_decoder=False,
                encoder_name="mobilenetv3_large_100",
            ),
            fusion_model=dict(type="FusionUnet"),
        )
        super().__init__(parent_cfg)
        self.resizer_kind = resizer_kind
        self.net = PFNet(
            coarse=coarse_mod,
            fine=fine_mod,
            guided_fusion=guided,
            min_depth=cfg.min_depth,
            max_depth=cfg.max_depth,
            patch_process_shape=tuple(cfg.patch_process_shape),
            n_bins=coarse_cfg.get("n_bins", 64),
            bin_centers_type=coarse_cfg.get("bin_centers_type", "softplus"),
            bin_embedding_dim=coarse_cfg.get("bin_embedding_dim", 128),
            n_attractors=tuple(coarse_cfg.get("n_attractors", [16, 8, 4, 1])),
            attractor_alpha=coarse_cfg.get("attractor_alpha", 1000),
            attractor_gamma=coarse_cfg.get("attractor_gamma", 2),
            attractor_kind=coarse_cfg.get("attractor_kind", "mean"),
            attractor_type=coarse_cfg.get("attractor_type", "inv"),
            min_temp=coarse_cfg.get("min_temp", 0.0212),
            max_temp=coarse_cfg.get("max_temp", 50.0),
        )

    def init(self, rng: jax.Array, train_batch=None):
        pph, ppw = self.patch_input_shape
        clh, clw = self.coarse_input_shape(self.patch_process_shape)
        image_lr = jnp.zeros((1, clh, clw, 3), jnp.float32)
        crops = jnp.zeros((1, pph, ppw, 3), jnp.float32)
        bboxs = jnp.asarray([[0.0, 0.0, ppw / 4, pph / 4]], jnp.float32)

        def init_fn(r):
            return self.net.init(r, image_lr, crops, bboxs, method=PFNet.train_forward)

        return jax.jit(init_fn)(rng)

    def loss(self, variables, batch, rng=None, mutable=False):
        bboxs = batch["bboxs"].astype(jnp.float32)
        if not self.pre_norm_bbox:
            rh, rw = self.tile_cfg.image_raw_shape
            ph, pw = self.patch_process_shape
            factor = jnp.asarray([pw / rw, ph / rh, pw / rw, ph / rh], jnp.float32)
            bboxs = bboxs * factor
        out = self.net.apply(
            variables, batch["image_lr"], batch["crops_image_hr"], bboxs,
            train=bool(mutable), method=PFNet.train_forward, mutable=mutable,
        )
        (depth, coarse_pred), new_vars = out if mutable else (out, None)
        sig = self.sigloss(depth, batch["crop_depths"], self.min_depth, self.max_depth)
        return {"sig_loss": sig, "total_loss": sig}, {
            "depth_pred": depth,
            "coarse_prediction": coarse_pred,
            "variables": new_vars,
        }

