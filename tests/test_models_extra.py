"""Smoke tests: PatchFusion, PatchRefinerSemi, V1 PatchRefiner, extra losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


def _coarse_cfg():
    return dict(
        type="DA-ZoeDepth",
        encoder="vitt",
        core_features=64,
        core_out_channels=[24, 48, 96, 96],
        n_bins=16,
        attractor_alpha=1000,
        attractor_kind="mean",
        attractor_type="inv",
    )


def test_patchfusion_train_and_infer():
    cfg = dict(
        image_raw_shape=[168, 224],
        patch_process_shape=[84, 112],
        patch_split_num=[2, 2],
        min_depth=1e-3,
        max_depth=80,
        coarse_branch=_coarse_cfg(),
        fine_branch=_coarse_cfg(),
        guided_fusion=dict(
            type="GuidedFusionPatchFusion",
            n_channels=5,
            g2l=True,
            in_channels=[32, 64, 64, 64, 64, 64],
            depth=[1, 1, 1, 1, 1, 1],
            num_heads=[2, 2, 2, 2, 2, 2],
            num_patches=[84 * 112, 48 * 64, 24 * 32, 12 * 16, 6 * 8, 3 * 4],
            window=4,
        ),
        sigloss=dict(type="SILogLoss"),
        load_branch=False,
        pre_norm_bbox=True,
    )
    model = MODELS.build(dict(type="PatchFusion", config=cfg))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }
    loss_dict, aux = model.loss_jit(variables, batch, mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))

    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    depth, _ = model.infer(
        variables, batch["image_lr"], image_hr, cai_mode="m1", process_num=2
    )
    assert depth.shape == (168, 224)
    assert np.isfinite(np.asarray(depth)).all()


def test_patchrefiner_v1_train():
    cfg = dict(
        image_raw_shape=[168, 224],
        patch_process_shape=[84, 112],
        patch_split_num=[2, 2],
        fusion_feat_level=6,
        min_depth=1e-3,
        max_depth=80,
        strategy_refiner_target="offset_coarse",
        coarse_branch=_coarse_cfg(),
        refiner=dict(
            fine_branch=_coarse_cfg(),
            fusion_model=dict(
                type="FusionUnet",
                input_chl=[64, 128, 128, 128, 128, 64],
                temp_chl=[16, 32, 32, 32, 32, 32],
                dec_chl=[32, 32, 32, 32, 16],
            ),
        ),
        sigloss=dict(type="SILogLoss"),
        pre_norm_bbox=True,
    )
    model = MODELS.build(dict(type="PatchRefiner", config=cfg))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }
    loss_dict, aux = model.loss_jit(variables, batch, mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))
    assert float(jnp.min(aux["depth_pred"])) >= 0.0


def test_semi_online_pseudo_label():
    student_cfg = dict(type="PatchRefinerPlus", config=tiny_config())
    teacher_cfg = dict(type="PatchRefinerPlus", config=tiny_config())
    model = MODELS.build(
        dict(
            type="PatchRefinerSemi",
            model_cfg_student=student_cfg,
            model_cfg_teacher=teacher_cfg,
            edgeloss=dict(type="ScaleAndShiftInvariantDALoss", grad_matching=True),
            edge_loss_weight=0.5,
        )
    )
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "depth_gt": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }
    loss_dict, aux = model.loss_jit(variables, batch, mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))
    assert "edge_loss" in loss_dict
    assert aux["pseudo_label"].shape == batch["crop_depths"].shape


def test_semi_feature_distillation():
    """Distill path: fusion final-conv features, MSE distill loss with a
    1x1-conv connector (reference hook point patchrefiner_semi.py:99-106;
    the loss application completes the reference's dead wiring)."""
    student_cfg = dict(type="PatchRefinerPlus", config=tiny_config())
    teacher_cfg = dict(type="PatchRefinerPlus", config=tiny_config())
    model = MODELS.build(
        dict(
            type="PatchRefinerSemi",
            model_cfg_student=student_cfg,
            model_cfg_teacher=teacher_cfg,
            edgeloss=dict(type="SILogLoss"),
            edge_loss_weight=0.5,
            distill=True,
            distill_loss_weight=0.1,
            distill_loss=dict(type="BaseDistillLoss", student_trans="conv", embed_dims=32),
        )
    )
    variables = model.init(jax.random.PRNGKey(0))
    assert "distill_connector" in variables["params"]
    rng = np.random.RandomState(7)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "depth_gt": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }
    loss_dict, _ = model.loss_jit(variables, batch, mutable=True)
    assert "distill_loss" in loss_dict
    assert np.isfinite(float(loss_dict["total_loss"]))
    assert np.isfinite(float(loss_dict["distill_loss"]))


def test_ranking_and_extra_losses():
    from patchrefinerv2_tpu.models.losses_extra import (
        EdgeguidedRankingLoss,
        ScaleAndShiftInvariantUncertLoss,
        ErrorLoss,
    )

    rng = np.random.RandomState(3)
    pred = jnp.asarray(1 + 5 * rng.rand(2, 32, 48, 1), jnp.float32)
    tgt = jnp.asarray(1 + 5 * rng.rand(2, 32, 48, 1), jnp.float32)
    img = jnp.asarray(rng.rand(2, 32, 48, 3), jnp.float32)

    loss_fn = EdgeguidedRankingLoss(point_pairs=128, min_depth=1e-3, max_depth=80)
    loss, n = jax.jit(lambda p, t, i: loss_fn(p, t, i, t, rng=jax.random.PRNGKey(0)))(
        pred, tgt, img
    )
    assert np.isfinite(float(loss)) and float(n) > 0

    un = jnp.asarray(rng.rand(2, 32, 48, 1), jnp.float32)
    mask = jnp.ones_like(tgt, bool)
    ul = ScaleAndShiftInvariantUncertLoss(grad_matching=True)
    v = jax.jit(lambda *a: ul(*a, 1e-3, 80, un))(pred, tgt, tgt, mask)
    assert np.isfinite(float(v))

    el = ErrorLoss(loss_type="incoh+grad", focal_weight=0.5)
    probs = jax.nn.softmax(jnp.asarray(rng.rand(2, 32, 48, 4), jnp.float32), axis=-1)
    dice, focal, gt_mask = jax.jit(lambda p, t, c: el(p, t, c, 1e-3, 80))(probs, tgt, pred)
    assert np.isfinite(float(dice)) and np.isfinite(float(focal))
    assert gt_mask.shape == (2, 32, 48)


def test_glb_att_and_heavy_fusion():
    """Exercise the TwoWayTransformer glb_att path and the Heavy variant."""
    cfg = tiny_config()
    cfg["refiner"]["fusion_model"]["glb_att"] = True
    cfg["refiner"]["fusion_model"]["att_dim"] = 32
    cfg["refiner"]["fusion_model"]["select_feat_index"] = [-1]
    cfg["refiner"]["fusion_model"]["pe_type"] = ""
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }
    loss_dict, _ = model.loss_jit(variables, batch, mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))

    cfg2 = tiny_config()
    cfg2["refiner"]["fusion_model"]["type"] = "BiDirectionalFusionHeavy"
    cfg2["refiner"]["fusion_model"]["temp_chl"] = [8, 8, 8, 16, 16, 32]
    cfg2["refiner"]["fusion_model"]["dec_chl"] = [32, 16, 16, 8, 8]
    model2 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg2))
    variables2 = model2.init(jax.random.PRNGKey(0))
    loss_dict2, _ = model2.loss_jit(variables2, batch, mutable=True)
    assert np.isfinite(float(loss_dict2["total_loss"]))
