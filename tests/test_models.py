"""Smoke + shape tests for the model zoo on a tiny geometry.

Tiny config: raw 168x224, 2x2 split, patch_process 84x112 (multiple of 14
and of 4), DA-ZoeDepth vits coarse, mobilenetv3 refiner. Exercises the full
train graph and the tiled m1/rN inference programs end to end on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.registry import MODELS


def tiny_config():
    return dict(
        e2e_training=False,
        pretrain_stage=False,
        image_raw_shape=[168, 224],
        patch_process_shape=[84, 112],
        patch_split_num=[2, 2],
        fusion_feat_level=6,
        min_depth=1e-3,
        max_depth=80,
        strategy_refiner_target="offset_coarse",
        coarse_branch=dict(
            type="DA-ZoeDepth",
            encoder="vitt",  # debug-tiny trunk: same code paths, fast compile
            core_features=64,
            core_out_channels=[24, 48, 96, 96],
            n_bins=16,
            attractor_alpha=1000,
            attractor_kind="mean",
            attractor_type="inv",
        ),
        refiner=dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=True,
                with_decoder=False,
                encoder_name="mobilenetv3_large_100",
            ),
            fusion_model=dict(
                type="BiDirectionalFusion",
                coarse2fine=True,
                coarse2fine_type="coarse-gated",
                coarse_chl=[32, 64, 64, 64, 64, 64],
                fine_chl=[16, 24, 40, 112, 960],
                fine_chl_after_coarse2fine=[32, 64, 64, 64, 64, 64],
                temp_chl=[32, 64, 64, 128, 256, 512],
                dec_chl=[512, 256, 128, 64, 32],
            ),
        ),
        sigloss=dict(type="SILogLoss"),
        gmloss=dict(type="GradMatchLoss"),
        sigweight=0.9,
        pre_norm_bbox=True,
        pretrain_coarse_model=None,
        pretrained=None,
        whole_pretrained=None,
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = MODELS.build(dict(type="PatchRefinerPlus", config=tiny_config()))
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_train_loss_finite(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(0)
    bs = 2
    batch = {
        "image_lr": jnp.asarray(rng.rand(bs, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(bs, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1.0 + 10 * rng.rand(bs, 84, 112, 1), jnp.float32),
        "depth_gt": jnp.asarray(1.0 + 10 * rng.rand(bs, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray(
            [[0.0, 0.0, 56.0, 42.0], [56.0, 42.0, 112.0, 84.0]], jnp.float32
        ),
    }
    loss_dict, aux = model.loss_jit(variables, batch, mutable=True)
    assert np.isfinite(float(loss_dict["total_loss"]))
    assert np.isfinite(float(loss_dict["sig_fine_loss"]))
    assert np.isfinite(float(loss_dict["gm_loss"]))
    assert aux["depth_pred"].shape[1:3] == (84, 112)
    # offset_coarse strategy clamps at zero
    assert float(jnp.min(aux["depth_pred"])) >= 0.0


def test_infer_m1_shape_and_finite(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(1)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    depth, coarse = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=2)
    # m1 returns the reensemble mosaic (patch_process * split)
    assert depth.shape == (168, 224)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.asarray(depth).min() >= 0.0


@pytest.mark.slow
def test_sharded_infer_matches_single_device(model_and_vars):
    """Mesh-sharded patch-chunk inference is numerically the single-device
    program (same math, XLA inserts the collectives)."""
    from patchrefinerv2_tpu.parallel.mesh import data_mesh

    model, variables = model_and_vars
    rng = np.random.RandomState(4)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    d1, _ = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=8)
    d8, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="m1", process_num=8, mesh=data_mesh()
    )
    assert np.asarray(d8).shape == np.asarray(d1).shape
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        model.infer(
            variables, image_lr, image_hr, cai_mode="m1", process_num=6,
            mesh=data_mesh(),
        )


@pytest.mark.slow
def test_sharded_infer_rn_matches_single_device(model_and_vars):
    """The full rN tiled program (regular + shifted + random passes, exact
    chunk stream) under the 8-device mesh equals the unsharded program —
    the multi-chip path the driver dry-runs, at the cai mode the bench
    records (patchrefinerplus.py:551-567 sharding)."""
    from patchrefinerv2_tpu.parallel.mesh import data_mesh

    model, variables = model_and_vars
    rng = np.random.RandomState(11)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    seed = jax.random.PRNGKey(3)
    d1, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r8", process_num=8, seed=seed
    )
    d8, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r8", process_num=8, seed=seed,
        mesh=data_mesh(),
    )
    assert np.asarray(d8).shape == np.asarray(d1).shape
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_infer_r4_runs_random_passes(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(2)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    d1, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r4", process_num=2,
        seed=jax.random.PRNGKey(7),
    )
    # rN output is at raw resolution
    assert d1.shape == (168, 224)
    assert np.isfinite(np.asarray(d1)).all()
    d2, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r4", process_num=2,
        seed=jax.random.PRNGKey(8),
    )
    # different random crops must change the blend
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


@pytest.mark.slow
def test_pretrain_stage_forward():
    cfg = tiny_config()
    cfg["pretrain_stage"] = True
    cfg["hack_strategy"] = "mean_0_std_1"
    cfg["refiner"]["fine_branch"]["coarse_condition"] = False
    cfg["refiner"]["fine_branch"]["with_decoder"] = True
    cfg["refiner"]["fusion_model"]["coarse_chl"] = [32, 256, 256, 256, 256, 256]
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "depth_gt": jnp.asarray(1.0 + 5 * rng.rand(1, 84, 112, 1), jnp.float32),
    }
    loss_dict, aux = model.loss_jit(
        variables, batch, rng=jax.random.PRNGKey(1), mutable=True
    )
    assert np.isfinite(float(loss_dict["total_loss"]))
    assert float(jnp.min(aux["depth_pred"])) >= 0.0
