"""PatchRefiner (V1): frozen ZoeDepth coarse + full ZoeDepth fine branch on
patches + FusionUnet offset head (estimator/models/patchrefiner.py:54-404).

Reuses the PatchRefinerPlus orchestration: the fine branch here is a whole
depth network emitting the same 6-level pyramid contract
(patchrefiner.py:221-233), adapted to the (feats, depth) refine interface.
Training loss is SILog only (patchrefiner.py:330-337).
"""

from __future__ import annotations

import flax.linen as nn

from patchrefinerv2_tpu.config import ConfigDict
from patchrefinerv2_tpu.registry import MODELS, build_model
from patchrefinerv2_tpu.models.patchrefinerplus import (
    PatchRefinerPlus,
    PRPlusNet,
    build_coarse_branch,
)


class ZoeFineBranch(nn.Module):
    """Adapter: full depth net -> (pyramid feats low->high res, depth)."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x, coarse_depth=None, train: bool = False):
        out = self.inner(x)
        return out["coarse_features"], out["metric_depth"]


@MODELS.register_module()
class PatchRefiner(PatchRefinerPlus):
    def __init__(self, config: dict):
        cfg = ConfigDict(ConfigDict._wrap(config))
        cfg.setdefault("pretrain_stage", False)
        cfg.setdefault("e2e_training", False)  # coarse always frozen in V1
        cfg.setdefault("sigweight", 1.0)  # total = sig_loss only
        cfg.setdefault("gmloss", {"type": "GradMatchLoss"})

        # build the fine branch from a coarse-style config and adapt it
        fine_cfg = ConfigDict(ConfigDict._wrap(cfg.refiner.fine_branch))
        fine_inner, _ = build_coarse_branch(fine_cfg, cfg.min_depth, cfg.max_depth)

        # let the parent build everything else with a placeholder, then
        # swap in the adapted fine branch
        parent_cfg = cfg.to_dict()
        parent_cfg["refiner"] = dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=False,
                with_decoder=False,
                encoder_name="mobilenetv3_large_100",
            ),
            fusion_model=cfg.refiner.fusion_model.to_dict()
            if hasattr(cfg.refiner.fusion_model, "to_dict")
            else dict(cfg.refiner.fusion_model),
        )
        super().__init__(parent_cfg)
        fine = ZoeFineBranch(inner=fine_inner)
        fusion = build_model(cfg.refiner.fusion_model)
        self.net = PRPlusNet(
            coarse=self.net.coarse,
            fine=fine,
            fusion=fusion,
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            strategy_refiner_target=self.strategy_refiner_target,
            patch_process_shape=self.patch_process_shape,
            fusion_feat_level=self.fusion_feat_level,
            e2e_training=False,
            coarse_is_da2=self.net.coarse_is_da2,
        )
