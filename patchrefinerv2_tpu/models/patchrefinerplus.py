"""PatchRefinerPlus (V2 flagship): coarse branch + lightweight refiner +
bidirectional fusion + the tiled-inference engine.

Reference: estimator/models/patchrefinerplus.py. The torch version drives
tiling with host control flow, per-patch roi_align over pre-repeated
feature tensors, and a CPU accumulator. Here the whole inference for a
(cai_mode, tile_cfg, process_num) signature is ONE jitted XLA program:

* coarse forward once per image (patchrefinerplus.py:479),
* per-chunk: crop+resize patches (MXU matmuls), roi_align the 6 coarse
  levels + coarse depth for the chunk only (saves the patch_num x feature
  blow-up of coarse_postprocess_test, :263-296),
* refiner encoder + fusion per chunk,
* scatter-add blending into HBM canvases (ops/blend.py) — no host trips
  (the reference detours through CPU per patch, baseline_pretrain.py:367).

Training (:427-467): bbox normalize (pre_norm_bbox), coarse (optionally
stop-gradient when e2e_training=False, :126-129), roi per level, refiner +
fusion, SILog + GradMatch mix. Pretrain stage (:382-424): refiner +
decoder with hacked coarse features (mean_0_std_1 / constant).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.config import ConfigDict
from patchrefinerv2_tpu.registry import MODELS, build_model
from patchrefinerv2_tpu.models.backbones.beit import MidasDPTBEiT
from patchrefinerv2_tpu.models.backbones.dpt import DepthAnythingV2
from patchrefinerv2_tpu.models.backbones.zoedepth import ZoeDepthDA, ZoeDepthHead
from patchrefinerv2_tpu.models.tiling import (
    TileCfg,
    crop_resize_patches,
    merge_all_passes,
    random_pass_starts,
    regular_pass,
)
from patchrefinerv2_tpu.ops.blend import TileBlender
from patchrefinerv2_tpu.ops.masks import generate_blend_mask
from patchrefinerv2_tpu.ops.resize import resize
from patchrefinerv2_tpu.ops.roi_align import roi_align


def _mesh_data_size(mesh) -> int:
    """Devices along the patch-sharding axis: the 'data' axis of a named
    mesh (1-D data or 2-D data x model), else every device."""
    return mesh.shape.get("data", mesh.devices.size)


def _da_round(size: tuple[int, int]) -> tuple[int, int]:
    """DA resizer target: round to multiple of 14 (transform.py:52-75)."""
    return (int(round(size[0] / 14) * 14), int(round(size[1] / 14) * 14))


class ZoeDepthBEiT(nn.Module):
    """'ZoeDepth' coarse type: BEiT MiDaS core + metric bins head
    (zoedepth_v1.py:296-311 with midas_model_type='DPT_BEiT_L_384')."""

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
    min_temp: float = 0.0212
    max_temp: float = 50.0
    # trunk size passthrough (defaults = BEiT-L/16; smaller for the
    # flagship-tree mesh tests, same param paths)
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, x):
        rel, pyramid = MidasDPTBEiT(
            name="core",
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            taps=tuple(self.taps),
            features=self.features,
            out_channels=tuple(self.out_channels),
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


def build_coarse_branch(cfg: ConfigDict, min_depth: float, max_depth: float):
    """Map reference coarse_branch configs to flax modules.

    Returns (module, resizer_kind) where resizer_kind in {'zoe', 'da'}
    selects the estimator patch resizer semantics
    (patchrefinerplus.py:102-124).
    """
    ctype = cfg["type"]
    if ctype == "ZoeDepth":
        trunk = cfg.get("trunk", {})  # test-size overrides; default BEiT-L/16
        return (
            ZoeDepthBEiT(
                embed_dim=trunk.get("embed_dim", 1024),
                depth=trunk.get("depth", 24),
                num_heads=trunk.get("num_heads", 16),
                taps=tuple(trunk.get("taps", (5, 11, 17, 23))),
                features=trunk.get("features", 256),
                out_channels=tuple(
                    trunk.get("out_channels", (256, 512, 1024, 1024))),
                n_bins=cfg.get("n_bins", 64),
                bin_centers_type=cfg.get("bin_centers_type", "softplus"),
                bin_embedding_dim=cfg.get("bin_embedding_dim", 128),
                min_depth=min_depth,
                max_depth=max_depth,
                n_attractors=tuple(cfg.get("n_attractors", [16, 8, 4, 1])),
                attractor_alpha=cfg.get("attractor_alpha", 1000),
                attractor_gamma=cfg.get("attractor_gamma", 2),
                attractor_kind=cfg.get("attractor_kind", "mean"),
                attractor_type=cfg.get("attractor_type", "inv"),
                min_temp=cfg.get("min_temp", 0.0212),
                max_temp=cfg.get("max_temp", 50.0),
            ),
            "zoe",
        )
    if ctype == "DA-ZoeDepth":
        return (
            ZoeDepthDA(
                encoder=cfg.get("encoder", "vits"),
                core_features=cfg.get("core_features", 256),
                core_out_channels=tuple(cfg.get("core_out_channels", [256, 512, 1024, 1024])),
                n_bins=cfg.get("n_bins", 64),
                bin_centers_type=cfg.get("bin_centers_type", "softplus"),
                min_depth=min_depth,
                max_depth=max_depth,
                n_attractors=tuple(cfg.get("n_attractors", [16, 8, 4, 1])),
                attractor_alpha=cfg.get("attractor_alpha", 1000),
                attractor_gamma=cfg.get("attractor_gamma", 2),
                attractor_kind=cfg.get("attractor_kind", "mean"),
                attractor_type=cfg.get("attractor_type", "inv"),
            ),
            "da",
        )
    if ctype == "DA2":
        mc = cfg.get("model_cfg", {})
        return (
            DepthAnythingV2(
                encoder=mc.get("encoder", "vitl"),
                features=mc.get("features", 256),
                max_depth=max_depth,
            ),
            "da",
        )
    raise ValueError(f"unknown coarse branch type {ctype!r}")


class PRPlusNet(nn.Module):
    """The pure compute graph; orchestration lives in PatchRefinerPlus."""

    coarse: nn.Module | None
    fine: nn.Module
    fusion: nn.Module
    min_depth: float
    max_depth: float
    strategy_refiner_target: str
    patch_process_shape: tuple[int, int]
    fusion_feat_level: int
    e2e_training: bool
    coarse_is_da2: bool = False
    pes: tuple = ()  # PositionEmbeddingRandom per level when glb_att is on
    # True when fusion is an nn.remat-wrapped BiDirectionalFusion: remat's
    # static_argnums require a positional call
    fusion_positional: bool = False

    def coarse_forward(self, image_lr):
        out = self.coarse(image_lr)
        feats = out["coarse_features"]
        pred = out["metric_depth"]
        if not self.e2e_training:
            feats = [jax.lax.stop_gradient(f) for f in feats]
            pred = jax.lax.stop_gradient(pred)
        return feats, pred

    def _roi(self, coarse_pred, coarse_feats, bboxes, box_idx):
        """roi_align each level + prediction (patchrefinerplus.py:239-296);
        spatial_scale = h_feat / patch_process_h, out_size = feature size."""
        pph = self.patch_process_shape[0]
        feat_rois = []
        for feat in coarse_feats:
            h, w = feat.shape[1:3]
            feat_rois.append(
                roi_align(feat, bboxes, box_idx, (h, w), h / pph)
            )
        h, w = coarse_pred.shape[1:3]
        pred_roi = roi_align(coarse_pred, bboxes, box_idx, (h, w), h / pph)
        return feat_rois, pred_roi

    def _pe(self, coarse_feats, bboxes, box_idx):
        """Per-level random-Fourier PEs + their roi'd patches for glb_att
        (patchrefinerplus.py:248-258): PEs over coarse_features[:-1]."""
        if not self.pes:
            return None, None
        pph = self.patch_process_shape[0]
        n = bboxes.shape[0]
        pe_list, pe_patch_list = [], []
        for i, feat in enumerate(coarse_feats[:-1]):
            h, w = feat.shape[1:3]
            pe = self.pes[i]((h, w))[None]  # (1, h, w, C)
            pe_b = jnp.broadcast_to(pe, (n,) + pe.shape[1:])
            pe_patch = roi_align(
                pe_b, bboxes, jnp.arange(n, dtype=jnp.int32), (h, w), h / pph
            )
            pe_list.append(jnp.broadcast_to(pe, (n,) + pe.shape[1:]))
            pe_patch_list.append(pe_patch)
        return pe_list, pe_patch_list

    def refine(
        self,
        imgs_crop,
        coarse_feat_rois,
        coarse_pred_roi,
        train: bool = False,
        pe_list=None,
        pe_patch_list=None,
        return_feat: bool = False,
    ):
        """Refiner + fusion on a batch of patches (infer_forward,
        patchrefinerplus.py:330-365)."""
        # keep one compute dtype through the patch pipeline — a single f32
        # input promotes every concat/conv downstream to f32
        cdt = imgs_crop.dtype
        coarse_pred_roi = coarse_pred_roi.astype(cdt)
        coarse_feat_rois = [f.astype(cdt) for f in coarse_feat_rois]
        r_feats, r_depth = self.fine(imgs_crop, coarse_pred_roi, train)
        if self.strategy_refiner_target == "offset_fine":
            update_base = r_depth
        elif self.strategy_refiner_target == "offset_coarse":
            update_base = coarse_pred_roi
        else:
            update_base = None
        L = self.fusion_feat_level
        c_list = list(coarse_feat_rois)[-L:][::-1]
        f_list = list(r_feats)[-L:][::-1]
        if self.fusion_positional:
            out = self.fusion(
                c_list, f_list, coarse_pred_roi, r_depth, update_base,
                pe_list, pe_patch_list, return_feat,
            )
        else:
            out = self.fusion(
                c_list, f_list, coarse_pred_roi, r_depth, update_base=update_base,
                pe_list=pe_list, pe_patch_list=pe_patch_list, return_feat=return_feat,
            )
        depth, feat = out if return_feat else (out, None)
        if self.strategy_refiner_target == "direct":
            depth = nn.sigmoid(depth) * self.max_depth
        if return_feat:
            return depth, feat
        return depth

    def infer_chunk(self, imgs_crop, coarse_pred, coarse_feats, bboxes):
        """One inference chunk: rois for these boxes only, then refine."""
        idx = jnp.zeros((bboxes.shape[0],), jnp.int32)
        feat_rois, pred_roi = self._roi(coarse_pred, coarse_feats, bboxes, idx)
        pe_list, pe_patch_list = self._pe(coarse_feats, bboxes, idx)
        return self.refine(
            imgs_crop, feat_rois, pred_roi, train=False,
            pe_list=pe_list, pe_patch_list=pe_patch_list,
        )

    def train_forward(self, image_lr, crops_image_hr, bboxs, train: bool = True,
                      return_feat: bool = False):
        """Training graph up to the depth prediction (losses applied by the
        orchestrator; patchrefinerplus.py:427-457). ``train=False`` runs the
        same graph with frozen BN stats (e.g. the semi teacher forward).
        ``return_feat`` additionally exposes the fusion head's final-conv
        input (the reference's distillation hook point)."""
        coarse_feats, coarse_pred = self.coarse_forward(image_lr)
        idx = jnp.arange(bboxs.shape[0], dtype=jnp.int32)
        feat_rois, pred_roi = self._roi(coarse_pred, coarse_feats, bboxs, idx)
        pe_list, pe_patch_list = self._pe(coarse_feats, bboxs, idx)
        out = self.refine(
            crops_image_hr, feat_rois, pred_roi, train=train,
            pe_list=pe_list, pe_patch_list=pe_patch_list, return_feat=return_feat,
        )
        if return_feat:
            depth, feat = out
            return depth, coarse_pred, feat
        return out, coarse_pred

    def pretrain_forward(self, image_lr, hack_strategy: str, rng=None):
        """Refiner pretraining with hacked coarse features
        (patchrefinerplus.py:382-424)."""
        feats, r_depth = self.fine(image_lr, None, True)
        c_list = []
        for i, f in enumerate(feats):
            b, h, w, _ = f.shape
            c = (128 if self.coarse_is_da2 else 32) if i == 5 else 256
            if hack_strategy == "mean_0_std_1":
                rng, sub = jax.random.split(rng)
                c_list.append(jax.random.normal(sub, (b, h, w, c), f.dtype))
            else:
                c_list.append(jnp.ones((b, h, w, c), f.dtype))
        pred1 = jnp.zeros_like(r_depth)
        depth = self.fusion(
            c_list[::-1], list(feats)[::-1], pred1, r_depth, update_base=None
        )
        return nn.relu(depth)


@MODELS.register_module()
class PatchRefinerPlus:
    """Config-built orchestrator: init / train loss / tiled inference."""

    def __init__(self, config: dict):
        cfg = ConfigDict(ConfigDict._wrap(config))
        self.config = cfg
        self.min_depth = cfg.min_depth
        self.max_depth = cfg.max_depth
        self.patch_process_shape = tuple(cfg.patch_process_shape)
        self.tile_cfg = TileCfg(
            tuple(cfg.image_raw_shape),
            tuple(cfg.patch_split_num),
            self.patch_process_shape,
        )
        self.pre_norm_bbox = cfg.get("pre_norm_bbox", True)
        self.pretrain_stage = cfg.get("pretrain_stage", False)
        self.hack_strategy = cfg.get("hack_strategy", "mean_0_std_1")
        self.strategy_refiner_target = cfg.get("strategy_refiner_target", "offset_coarse")
        self.fusion_feat_level = cfg.get("fusion_feat_level", 6)
        self.sigweight = cfg.get("sigweight", 1.0)
        self.sigloss = build_model(cfg.sigloss)
        self.gmloss = build_model(cfg.get("gmloss", {"type": "GradMatchLoss"}))
        # inference compute dtype: bfloat16 halves HBM traffic and doubles
        # MXU throughput; blending stays float32 (config key infer_dtype)
        self.infer_dtype = jnp.dtype(cfg.get("infer_dtype", "float32"))
        # training compute dtype (opt-in `train_dtype: bfloat16`): the
        # forward/backward matmuls run bf16 (2x MXU, half the activation
        # HBM) while the caller's params stay f32 master weights — the
        # in-loss cast's transpose returns f32 gradients, and bf16 keeps
        # f32's exponent range so no loss scaling is needed. Losses are
        # computed in f32; batch_stats stay f32 (BN train mode normalizes
        # with batch statistics, the running-stat update promotes to f32).
        # No reference counterpart (the reference trains f32/amp).
        self.train_dtype = jnp.dtype(cfg.get("train_dtype", "float32"))

        coarse_is_da2 = False
        if self.pretrain_stage:
            coarse_mod, self.resizer_kind = None, "zoe"
            if "coarse_branch" in cfg and cfg.coarse_branch.get("type") == "DA2":
                coarse_is_da2 = True
        else:
            coarse_mod, self.resizer_kind = build_coarse_branch(
                cfg.coarse_branch, self.min_depth, self.max_depth
            )
            coarse_is_da2 = cfg.coarse_branch.get("type") == "DA2"
        # remat: rematerialize the refiner encoder and fusion head in the
        # backward pass. The fusion head's full-patch-res activations are
        # what OOM a 16 GB chip at the reference's bs=4/device training
        # recipe (measured 17.06G > 15.75G); with remat the step trades
        # ~1/3 extra forward FLOPs for fitting the reference batch size.
        self.remat = bool(cfg.get("remat", False))
        if self.remat:
            from patchrefinerv2_tpu.registry import MODELS as _MODELS

            def _remat_build(sub_cfg, static_argnums):
                d = dict(sub_cfg)
                cls = _MODELS.get(d.pop("type"))
                return nn.remat(cls, static_argnums=static_argnums)(**d)

            # static argnums count self: fine.__call__(self, x, coarse, train)
            fine = _remat_build(cfg.refiner.fine_branch, (3,))
            fusion_type = cfg.refiner.fusion_model.get("type", "")
            if "BiDirectionalFusion" in fusion_type:
                # (self, c, f, p1, p2, update_base, pe, pe_patch, return_feat)
                fusion = _remat_build(cfg.refiner.fusion_model, (8,))
                self._fusion_positional = True
            else:
                fusion = build_model(cfg.refiner.fusion_model)
                self._fusion_positional = False
        else:
            fine = build_model(cfg.refiner.fine_branch)
            fusion = build_model(cfg.refiner.fusion_model)
            self._fusion_positional = False
        pes = ()
        if getattr(fusion, "glb_att", False):
            from patchrefinerv2_tpu.models.blocks.transformers import (
                PositionEmbeddingRandom,
            )

            pes = tuple(
                PositionEmbeddingRandom(
                    num_pos_feats=fusion.att_dim // 2, pe_type=fusion.pe_type
                )
                for _ in range(5)
            )
        self.e2e_training = cfg.get("e2e_training", False)
        self.net = PRPlusNet(
            coarse=coarse_mod,
            fine=fine,
            fusion=fusion,
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            strategy_refiner_target=self.strategy_refiner_target,
            patch_process_shape=self.patch_process_shape,
            fusion_feat_level=self.fusion_feat_level,
            e2e_training=self.e2e_training,
            coarse_is_da2=coarse_is_da2,
            pes=pes,
            fusion_positional=self._fusion_positional,
        )

    # ---------------------------------------------------------- helpers
    @property
    def patch_input_shape(self) -> tuple[int, int]:
        """Resizer output = patch network input (378x518-style rounding for
        DA cores, exact process shape for Zoe; patchrefinerplus.py:108-121)."""
        if self.resizer_kind == "da":
            return _da_round(self.patch_process_shape)
        return self.patch_process_shape

    def coarse_input_shape(self, lr_shape: tuple[int, int]) -> tuple[int, int]:
        if self.resizer_kind == "da":
            return _da_round(lr_shape)
        return lr_shape

    # ------------------------------------------------------------- init
    def init(self, rng: jax.Array, train_batch: dict | None = None):
        """Initialize all variables from a canonical shape set.

        The whole init runs as one jitted program — eager flax init compiles
        a tiny XLA program per parameter, which is minutes of host time for
        nets this size."""
        pph, ppw = self.patch_input_shape
        if self.pretrain_stage:
            image_lr = jnp.zeros((1, pph, ppw, 3), jnp.float32)

            def init_fn(r):
                return self.net.init(
                    r, image_lr, self.hack_strategy, r, method=PRPlusNet.pretrain_forward
                )

            return jax.jit(init_fn)(rng)
        clh, clw = self.coarse_input_shape(self.patch_process_shape)
        image_lr = jnp.zeros((1, clh, clw, 3), jnp.float32)
        crops = jnp.zeros((1, pph, ppw, 3), jnp.float32)
        bboxs = jnp.asarray([[0.0, 0.0, ppw / 4, pph / 4]], jnp.float32)

        def init_fn(r):
            return self.net.init(r, image_lr, crops, bboxs, method=PRPlusNet.train_forward)

        return jax.jit(init_fn)(rng)

    # ------------------------------------------------------- jitted loss
    def loss_jit(self, variables, batch, rng=None, mutable=False):
        """One-compile version of :meth:`loss` (cached per mutable flag +
        batch structure)."""
        key = bool(mutable)
        if not hasattr(self, "_loss_jit_cache"):
            self._loss_jit_cache = {}
        if key not in self._loss_jit_cache:
            mut = ["batch_stats"] if mutable else False
            self._loss_jit_cache[key] = jax.jit(
                lambda v, b, r: self.loss(v, b, rng=r, mutable=mut)
            )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._loss_jit_cache[key](variables, batch, rng)

    # ------------------------------------------------------------ train
    def loss(self, variables, batch: dict, rng: jax.Array | None = None, mutable=False,
             return_feat: bool = False):
        """(loss_dict, aux). batch keys follow the reference collect_input
        contract (u4k_dataset.py:206-213): image_lr, crops_image_hr,
        depth_gt, crop_depths, bboxs — all NHWC jnp arrays. With
        ``return_feat`` the aux carries ``distill_feat`` (fusion-head
        final-conv input) for PatchRefinerSemi feature distillation."""
        if self.pretrain_stage:
            net_vars, (img_lr,) = self._train_cast(variables, batch["image_lr"])
            out = self.net.apply(
                net_vars,
                img_lr,
                self.hack_strategy,
                rng,
                method=PRPlusNet.pretrain_forward,
                mutable=mutable,
            )
            depth, new_vars = out if mutable else (out, None)
            depth = depth.astype(jnp.float32)
            sig = self.sigloss(depth, batch["depth_gt"], self.min_depth, self.max_depth)
            loss_dict = {"sig_fine_loss": sig, "total_loss": sig}
            return loss_dict, {"depth_pred": depth, "variables": new_vars}

        bboxs = batch["bboxs"].astype(jnp.float32)
        if not self.pre_norm_bbox:
            rh, rw = self.tile_cfg.image_raw_shape
            ph, pw = self.patch_process_shape
            factor = jnp.asarray([pw / rw, ph / rh, pw / rw, ph / rh], jnp.float32)
            bboxs = bboxs * factor
        net_vars, (img_lr, crops) = self._train_cast(
            variables, batch["image_lr"], batch["crops_image_hr"]
        )
        out = self.net.apply(
            net_vars,
            img_lr,
            crops,
            bboxs,
            train=bool(mutable),
            return_feat=return_feat,
            method=PRPlusNet.train_forward,
            mutable=mutable,
        )
        fwd, new_vars = out if mutable else (out, None)
        if return_feat:
            depth, coarse_pred, distill_feat = fwd
        else:
            (depth, coarse_pred), distill_feat = fwd, None
        depth = depth.astype(jnp.float32)
        coarse_pred = coarse_pred.astype(jnp.float32)
        sig = self.sigloss(depth, batch["crop_depths"], self.min_depth, self.max_depth)
        gm = self.gmloss(depth, batch["crop_depths"], self.min_depth, self.max_depth)
        total = self.sigweight * sig + (1.0 - self.sigweight) * gm
        loss_dict = {"sig_fine_loss": sig, "gm_loss": gm, "total_loss": total}
        aux = {
            "depth_pred": depth,
            "coarse_prediction": coarse_pred,
            "variables": new_vars,
        }
        if return_feat:
            aux["distill_feat"] = distill_feat
        return loss_dict, aux

    # ------------------------------------------------------------ infer
    def _build_infer_fn(self, cai_mode: str, tile_cfg: TileCfg, process_num: int,
                        mesh=None):
        """Trace one full tiled-inference program for a static signature.

        With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over axis 'data'), the
        patch chunk is sharded across chips: each device refines
        process_num / n_devices patches and XLA all-gathers the small
        depth predictions for the (replicated) blending canvases. This is
        the TPU scale-out axis for single-image latency — the reference's
        only intra-image parallelism is the process_num chunk loop on one
        GPU (SURVEY.md section 5.7)."""
        net = self.net
        pph, ppw = self.patch_process_shape
        in_shape = self.patch_input_shape
        prh, prw = tile_cfg.patch_raw_shape
        reensemble = tile_cfg.patch_reensemble_shape
        raw = tile_cfg.image_raw_shape

        regular_offsets = [(0, 0)]
        if cai_mode == "m2" or cai_mode.startswith("r"):
            regular_offsets += [(0, 1), (1, 0), (1, 1)]
        if len(regular_offsets) == 1:
            passes = [(regular_pass(tile_cfg, off, process_num), None,
                       process_num) for off in regular_offsets]
        else:
            # merge ALL regular passes — init pass included, init semantics
            # carried per-patch (``initv``) — into ONE stream over ONE
            # compiled chunk body (tiling.merge_all_passes): the program
            # previously carried up to four structurally distinct refine
            # executables (init / merged / remainder / random chunk), which
            # blew the remote-compile budget at r32 and paid three
            # executable transitions per frame. Blending is commutative
            # scatter-add, so pass order doesn't matter. Chunk = the conv
            # batch granule (8; under a mesh its lcm with the 'data' axis
            # so every chunk shards evenly) — the 4x4/16 stream becomes
            # 49 -> 7 chunks of 8 (56 slots, same as the old 16+16+16+8).
            from patchrefinerv2_tpu.models.tiling import _BATCH_GRANULE

            # respect process_num as the memory knob (reference semantics,
            # docs/user_infer.md:14) — never chunk above it; under a mesh
            # every chunk must still split across the 'data' axis.
            # PRV2_REG_CHUNK: A/B override for the regular-stream chunk.
            chunk = int(os.environ.get(
                "PRV2_REG_CHUNK", min(process_num, _BATCH_GRANULE)))
            if mesh is not None:
                d = _mesh_data_size(mesh)
                chunk = chunk * d // math.gcd(chunk, d)
                if chunk > process_num:
                    # the lcm can overshoot the process_num memory knob
                    # (e.g. chunk 8, d=12 -> 24): fall back to the largest
                    # multiple of d that still fits, or d itself (the
                    # minimum shardable chunk) when the mesh 'data' axis is
                    # wider than process_num.
                    chunk = max(process_num // d * d, d)
            stream, initv = merge_all_passes(
                [regular_pass(tile_cfg, off, process_num)
                 for off in regular_offsets], chunk)
            passes = [(stream, initv, chunk)]
        n_random_iters = (
            int(cai_mode[1:]) // process_num if cai_mode.startswith("r") else 0
        )

        blur_proc = jnp.asarray(generate_blend_mask((pph, ppw), border=0.15))
        blur_raw = jnp.asarray(generate_blend_mask((prh, prw), border=0.15) + 1e-3)

        def infer_fn(variables, image_lr, image_hr, seed):
            if self.infer_dtype != jnp.float32:
                image_lr = image_lr.astype(self.infer_dtype)
                image_hr = image_hr.astype(self.infer_dtype)
            if self.resizer_kind == "da":
                target = _da_round(image_lr.shape[1:3])
                if tuple(image_lr.shape[1:3]) != target:
                    image_lr = resize(image_lr, target, "bilinear", True)
            coarse_feats, coarse_pred = net.apply(
                variables, image_lr, method=type(net).coarse_forward
            )

            def refine_chunk(imgs, bboxes):
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    sh = NamedSharding(mesh, PartitionSpec("data"))
                    imgs = jax.lax.with_sharding_constraint(imgs, sh)
                    bboxes = jax.lax.with_sharding_constraint(bboxes, sh)
                d = net.apply(
                    variables, imgs, coarse_pred, coarse_feats, bboxes,
                    method=type(net).infer_chunk,
                )
                return d[..., 0]

            # regular passes: lax.scan over fixed-size chunks — one chunk's
            # crop+roi+refine graph compiled once for the WHOLE regular
            # phase (single-pass m1 keeps the static init_pass form; the
            # unified multi-pass stream threads per-patch init flags)
            state = TileBlender.init(reensemble)
            for pi, (p, iv, chunk) in enumerate(passes):
                n = p.starts_raw.shape[0]
                n_chunks = n // chunk
                valid = (np.arange(n) < p.n_valid).astype(np.float32)
                xs = (
                    jnp.asarray(p.starts_raw).reshape(n_chunks, chunk, 2),
                    jnp.asarray(p.starts_process).reshape(n_chunks, chunk, 2),
                    jnp.asarray(p.bboxes).reshape(n_chunks, chunk, 4),
                    jnp.asarray(valid).reshape(n_chunks, chunk),
                    jnp.asarray(
                        iv if iv is not None else np.ones(n, np.float32)
                    ).reshape(n_chunks, chunk),
                )
                static_init = iv is None and pi == 0

                def chunk_body(st, x, _init=static_init, _perpatch=iv is not None):
                    s_raw, s_place, bboxes, v, ivec = x
                    imgs = crop_resize_patches(image_hr[0], s_raw, (prh, prw), in_shape)
                    preds = refine_chunk(imgs, bboxes)
                    if preds.shape[1:] != (pph, ppw):
                        preds = resize(preds[..., None], (pph, ppw), "bilinear", True)[..., 0]
                    st = TileBlender.add_pass(
                        st, preds, blur_proc, s_place, init_pass=_init, valid=v,
                        initv=ivec if _perpatch else None,
                    )
                    return st, None

                state, _ = jax.lax.scan(chunk_body, state, xs)

            if n_random_iters:
                state = TileBlender.resize(state, raw)

                def rand_body(carry, _):
                    st, key = carry
                    key, sub = jax.random.split(key)
                    starts, bboxes = random_pass_starts(sub, tile_cfg, process_num)
                    imgs = crop_resize_patches(image_hr[0], starts, (prh, prw), in_shape)
                    preds = refine_chunk(imgs, bboxes)
                    # reference resizes random-pass predictions with nearest
                    # (baseline_pretrain.py:210, F.interpolate default)
                    preds = resize(preds[..., None], (prh, prw), "nearest")[..., 0]
                    st = TileBlender.add_pass(st, preds, blur_raw, starts)
                    return (st, key), None

                (state, _), _ = jax.lax.scan(
                    rand_body, (state, seed), None, length=n_random_iters
                )

            depth = TileBlender.finalize(state)
            return depth, coarse_pred

        return infer_fn

    @functools.lru_cache(maxsize=8)
    def _jitted_infer(self, cai_mode: str, tile_key: tuple, process_num: int,
                      mesh=None):
        tile_cfg = TileCfg(tile_key[0], tile_key[1], self.patch_process_shape)
        fn = self._build_infer_fn(cai_mode, tile_cfg, process_num, mesh=mesh)
        return jax.jit(fn)

    def infer(
        self,
        variables,
        image_lr,
        image_hr,
        cai_mode: str = "m1",
        process_num: int = 4,
        tile_cfg: dict | None = None,
        seed: jax.Array | None = None,
        mesh=None,
    ):
        """Full-image tiled inference. image_lr (1,h,w,3), image_hr (1,H,W,3).

        Returns (depth (H', W'), coarse_pred) where H' is the reensemble
        shape for m1/m2 and the raw shape for rN (the Tester resizes to gt
        for metrics, mirroring tester.py:109-117 / metric.py:100-106).

        ``mesh``: optional Mesh — 1-D (('data',)) shards each patch chunk
        across its devices (process_num must divide evenly); inputs and
        params are placed replicated. 2-D (('data','model')) additionally
        shards the coarse-trunk attention/MLP kernels Megatron-style over
        'model' (parallel/tp.py), so the whole-image coarse forward — the
        replicated residual of patch sharding — also scales.
        """
        tc = self.tile_cfg
        if tile_cfg is not None:
            tc = TileCfg(
                tuple(tile_cfg["image_raw_shape"]),
                tuple(tile_cfg["patch_split_num"]),
                self.patch_process_shape,
            )
        if mesh is not None and process_num % _mesh_data_size(mesh):
            raise ValueError(
                f"process_num={process_num} must be divisible by the mesh "
                f"'data' axis {_mesh_data_size(mesh)}"
            )
        fn = self._jitted_infer(
            cai_mode, (tc.image_raw_shape, tc.patch_split_num), process_num,
            mesh=mesh,
        )
        if seed is None:
            seed = jax.random.PRNGKey(0)
        variables = self._infer_variables(variables)
        if mesh is not None:
            from patchrefinerv2_tpu.parallel.mesh import replicate_tree

            if "model" in mesh.shape and mesh.shape["model"] > 1:
                from patchrefinerv2_tpu.parallel.tp import shard_tp

                variables = shard_tp(variables, mesh, within="coarse")
            else:
                variables = replicate_tree(variables, mesh)
            image_lr = replicate_tree(image_lr, mesh)
            image_hr = replicate_tree(image_hr, mesh)
        return fn(variables, image_lr, image_hr, seed)

    def calibrate_int8(self, variables, images, process_num: int = 16,
                       tile_cfg: dict | None = None):
        """Post-training-quantization calibration for the static-scale int8
        serving mode (ops/quant.py): run the patch pipeline over the given
        ``images`` (a list of (image_lr, image_hr) pairs) with
        ``PRV2_INT8_CALIB=1`` so every quant-eligible conv sows its
        activation abs-max, fold the observations, and return ``variables``
        with the resulting ``quant_scales`` collection merged in. Serving
        with these variables under ``PRV2_INT8=1`` then skips the dynamic
        per-conv abs-max reduction (measured -13% end-to-end) and quantizes
        against the calibrated grid. Covers the m1 regular pass + the three
        shifted passes (the rN random patches see the same activation
        distributions). No reference counterpart (the reference has no
        quantized inference)."""
        import os

        tc = self.tile_cfg
        if tile_cfg is not None:
            tc = TileCfg(
                tuple(tile_cfg["image_raw_shape"]),
                tuple(tile_cfg["patch_split_num"]),
                self.patch_process_shape,
            )
        net = self.net
        in_shape = self.patch_input_shape
        prh, prw = tc.patch_raw_shape
        cast_vars = self._infer_variables(variables)

        @jax.jit
        def _coarse(v, img_lr):
            if self.infer_dtype != jnp.float32:
                img_lr = img_lr.astype(self.infer_dtype)
            if self.resizer_kind == "da":
                target = _da_round(img_lr.shape[1:3])
                if tuple(img_lr.shape[1:3]) != target:
                    img_lr = resize(img_lr, target, "bilinear", True)
            return net.apply(v, img_lr, method=type(net).coarse_forward)

        @jax.jit
        def _calib_chunk(v, imgs, coarse_pred, coarse_feats, bboxes):
            _, stats = net.apply(
                v, imgs, coarse_pred, coarse_feats, bboxes,
                method=type(net).infer_chunk,
                mutable=["quant_stats", "quant_kq"],
            )
            return stats["quant_stats"], stats["quant_kq"]

        os.environ["PRV2_INT8_CALIB"] = "1"
        try:
            stats_trees = []
            last_inputs = None
            for image_lr, image_hr in images:
                coarse_feats, coarse_pred = _coarse(cast_vars, image_lr)
                hr = image_hr[0]
                if self.infer_dtype != jnp.float32:
                    hr = hr.astype(self.infer_dtype)
                for off in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    p = regular_pass(tc, off, process_num)
                    n = p.starts_raw.shape[0]
                    for lo in range(0, n, process_num):
                        s_raw = jnp.asarray(p.starts_raw[lo:lo + process_num])
                        bboxes = jnp.asarray(p.bboxes[lo:lo + process_num])
                        imgs = crop_resize_patches(hr, s_raw, (prh, prw), in_shape)
                        stats, _ = _calib_chunk(
                            cast_vars, imgs, coarse_pred, coarse_feats, bboxes
                        )
                        stats_trees.append(stats)
                        last_inputs = (imgs, coarse_pred, coarse_feats, bboxes)

            from patchrefinerv2_tpu.ops.quant import scales_from_stats

            scales = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32),
                jax.device_get(scales_from_stats(stats_trees)),
            )
            # finalize pass: with the FOLDED scales injected, each site
            # pre-quantizes its serving-dtype kernel — including the
            # perchan-folded variant (ops/quant.py ``kqc``/``swc``), which
            # needs the final per-channel activation scales. Weights are
            # input-independent, so one chunk suffices.
            _, kq_tree = _calib_chunk(
                {**cast_vars, "quant_scales": scales}, *last_inputs
            )
        finally:
            os.environ.pop("PRV2_INT8_CALIB", None)

        # quant_kq: pre-quantized (int8 kernel, per-out-channel scale)
        # snapshots of the serving-dtype params. Serving reads them as
        # variables instead of re-quantizing weights inside the
        # patch-chunk scan. Re-run calibrate_int8 after any weight update.
        # NOTE: must stay DEVICE arrays — numpy leaves here would be
        # re-uploaded through the host tunnel on every infer call
        # (measured -82% end-to-end when this returned device_get'd trees).
        return dict(
            variables,
            quant_scales=scales,
            quant_kq=kq_tree,
        )

    def _train_cast(self, variables, *arrays):
        """Mixed-precision training cast (config key ``train_dtype``): the
        f32 param leaves and the image inputs go to the compute dtype INSIDE
        the traced loss, so the caller's f32 master params receive f32
        gradients through the cast's transpose. batch_stats (and other
        collections) stay f32 — BN train mode normalizes with batch
        statistics, and the running-stat momentum update promotes back to
        f32. No-op at the default f32."""
        if self.train_dtype == jnp.float32:
            return variables, arrays
        params = jax.tree_util.tree_map(
            lambda a: a.astype(self.train_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            variables["params"],
        )
        variables = dict(variables, params=params)
        return variables, tuple(a.astype(self.train_dtype) for a in arrays)

    def _infer_variables(self, variables):
        """Cast parameters to the inference dtype ONCE outside the jit (an
        in-graph cast keeps f32 weight copies alive in the executable and
        doubles the parameter HBM traffic). Cached per variables identity."""
        if self.infer_dtype == jnp.float32:
            return variables
        cache = getattr(self, "_cast_cache", None)
        if cache is not None and cache[0] is variables:
            return cache[1]
        # quant_* collections stay in their calibrated dtypes: the f32
        # activation scales are scalars (no traffic win from bf16, only
        # dequant-grid precision loss) and the int8 kernels must not be
        # touched
        cast = {
            coll: (
                tree
                if coll.startswith("quant_")
                else jax.tree_util.tree_map(
                    lambda a: a.astype(self.infer_dtype)
                    if hasattr(a, "dtype") and a.dtype == jnp.float32
                    else a,
                    tree,
                )
            )
            for coll, tree in variables.items()
        }
        self._cast_cache = (variables, cast)
        return cast
