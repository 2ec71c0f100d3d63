"""Default-flags runtime sweep over the model-variant matrix.

One tiny train step + one tiled m1 inference for every model family x
fusion variant, under the DEFAULT environment flags (no PRV2_* overrides)
— exactly the class of breakage the r3 space-to-depth relayout shipped
with (VERDICT r3 #7): an optimization defaulted ON that worked for the
flagship path but crashed Heavy/glb_att consumers at trace time.

The reference's implicit guarantee is that every shipped config runs
(/root/reference/configs/**); this sweep is its executable form on the
tiny geometry.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


@pytest.fixture(autouse=True)
def _default_flags():
    """The sweep must run at what users get: fail loudly if the test
    environment carries PRV2_* overrides."""
    leaked = [k for k in os.environ if k.startswith("PRV2_")]
    assert not leaked, f"variant smoke must run at default flags, got {leaked}"


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


def _batch(rng, bs=1):
    return {
        "image_lr": jnp.asarray(rng.rand(bs, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(bs, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(bs, 84, 112, 1), jnp.float32),
        "depth_gt": jnp.asarray(1 + 10 * rng.rand(bs, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }


def _plus_cfg(variant):
    cfg = tiny_config()
    fm = cfg["refiner"]["fusion_model"]
    if variant == "heavy":
        fm["type"] = "BiDirectionalFusionHeavy"
        fm["temp_chl"] = [8, 8, 8, 16, 16, 32]
        fm["dec_chl"] = [32, 16, 16, 8, 8]
    elif variant == "glb_att":
        fm["glb_att"] = True
        fm["att_dim"] = 32
        fm["select_feat_index"] = [-1]
        fm["pe_type"] = ""
    elif variant == "only-gate":
        fm["coarse2fine_type"] = "only-gate"
    else:
        assert variant == "standard"
    return cfg


def _train_and_infer(model, seed=0):
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(seed)
    loss_dict, _ = model.loss_jit(variables, _batch(rng), mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    depth, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="m1", process_num=2
    )
    assert depth.shape == (168, 224)
    assert np.isfinite(np.asarray(depth)).all()


@pytest.mark.parametrize("variant", ["standard", "heavy", "glb_att", "only-gate"])
def test_plus_fusion_variants(variant):
    model = MODELS.build(dict(type="PatchRefinerPlus", config=_plus_cfg(variant)))
    _train_and_infer(model)


def test_v1_patchrefiner():
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
    _train_and_infer(model, seed=1)


def test_semi():
    model = MODELS.build(
        dict(
            type="PatchRefinerSemi",
            model_cfg_student=dict(type="PatchRefinerPlus", config=tiny_config()),
            model_cfg_teacher=dict(type="PatchRefinerPlus", config=tiny_config()),
            edgeloss=dict(type="SILogLoss"),
            edge_loss_weight=0.5,
        )
    )
    _train_and_infer(model, seed=2)


def test_patchfusion():
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
    _train_and_infer(model, seed=3)


def test_baseline_pretrain():
    model = MODELS.build(
        dict(
            type="BaselinePretrain",
            coarse_branch=_coarse_cfg(),
            sigloss=dict(type="SILogLoss"),
            min_depth=1e-3,
            max_depth=80,
            image_raw_shape=[168, 224],
            patch_process_shape=[84, 112],
            patch_split_num=[2, 2],
            target="coarse",
        )
    )
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    loss_dict, _ = jax.jit(lambda v, b: model.loss(v, b))(variables, _batch(rng))
    assert np.isfinite(float(loss_dict["total_loss"]))
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    depth, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="m1", process_num=2
    )
    assert np.isfinite(np.asarray(depth)).all()
