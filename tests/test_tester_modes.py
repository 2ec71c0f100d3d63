"""Tester auxiliary modes: pseudo-label generation, patch-consistency,
benchmark, model complexity, feature visualization, gt dumps.

Mirrors the reference Tester surface (tester.py:132-180 generate_pl,
:212-321 run_consistency, :325-404 benchmark+complexity, :407-455
vis_feat, :183 show_gts) on the tiny model over the synthetic dataset.
"""

import os

import jax
import numpy as np
import pytest

from patchrefinerv2_tpu.registry import MODELS, DATASETS
from patchrefinerv2_tpu.datasets.base import DataLoader
from patchrefinerv2_tpu.evaluation.tester import Tester
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


@pytest.fixture(scope="module")
def tiny_setup():
    model = MODELS.build(dict(type="PatchRefinerPlus", config=tiny_config()))
    variables = model.init(jax.random.PRNGKey(0))
    ds = DATASETS.build(
        dict(
            type="SyntheticDataset",
            mode="infer",
            length=2,
            image_raw_shape=(168, 224),
            network_process_size=(84, 112),
        )
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_prefetch=0)
    return model, variables, loader


def test_generate_pl_writes_uint16(tiny_setup, tmp_path):
    model, variables, loader = tiny_setup
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    tester.generate_pl(
        variables,
        cai_mode="m1",
        process_num=2,
        tile_cfg={"image_raw_shape": [168, 224], "patch_split_num": [2, 2]},
    )
    pls = [f for f in os.listdir(tmp_path) if f.endswith("_uint16.png")]
    assert len(pls) == 2
    # uint16 PNG scaled x256 (tester.py:160-162): round-trips to metric depth
    from PIL import Image

    arr = np.asarray(Image.open(tmp_path / pls[0]), np.float32) / 256.0
    assert np.isfinite(arr).all() and arr.max() > 0


def test_run_consistency_returns_error(tiny_setup, tmp_path):
    """Reference semantics (tester.py:212-321): per-crop train-mode
    forwards over the dataset's fixed overlapping grid, left/up overlap
    MAE, evaluate_consistency aggregation."""
    model, variables, _ = tiny_setup
    ds = DATASETS.build(
        dict(
            type="SyntheticDataset",
            mode="train",
            consistency=True,
            length=1,
            image_raw_shape=(168, 224),
            network_process_size=(84, 112),
            patch_raw_shape=(42, 56),
            overlap=20,
        )
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_prefetch=0)
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    out = tester.run_consistency(variables, process_num=4)
    assert "consistency" in out and np.isfinite(out["consistency"])
    assert out["consistency"] >= 0
    assert out["consistency_error"] == out["consistency"]


def test_run_consistency_matches_per_crop_reference_loop(tiny_setup, tmp_path):
    """The chunked-batch forward must equal the reference's one-crop-at-a-
    time loop (tester.py:228-244) followed by align_corners=True bilinear
    upsample and the left/up strip MAE (:246-301)."""
    import jax.numpy as jnp

    from patchrefinerv2_tpu.ops.resize import resize

    model, variables, _ = tiny_setup
    ds = DATASETS.build(
        dict(
            type="SyntheticDataset",
            mode="train",
            consistency=True,
            length=1,
            image_raw_shape=(168, 224),
            network_process_size=(84, 112),
            patch_raw_shape=(42, 56),
            overlap=20,
        )
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_prefetch=0)
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    got = tester.run_consistency(variables, process_num=4)["consistency"]

    # reference-style scalar loop
    batch = next(iter(DataLoader(ds, batch_size=1, shuffle=False, num_prefetch=0)))
    ph, pw = ds.patch_raw_shape
    ov = ds.overlap
    preds = []
    for i in range(16):
        sub = {
            "image_lr": jnp.asarray(batch["image_lr"][:1]),
            "crops_image_hr": jnp.asarray(batch["crops_image_hr"][:, i]),
            "crop_depths": jnp.asarray(batch["crop_depths"][:, i]),
            "bboxs": jnp.asarray(batch["bboxs"][:, i]),
        }
        _, aux = model.loss(variables, sub)
        preds.append(np.asarray(resize(aux["depth_pred"], (ph, pw), "bilinear", True), np.float32)[0, :, :, 0])
    errs = []
    for ii in range(4):
        for jj in range(4):
            k = ii * 4 + jj
            if ii > 0:
                errs.append(np.abs(preds[k - 4][-ov:, :] - preds[k][:ov, :]).ravel())
            if jj > 0:
                errs.append(np.abs(preds[k - 1][:, -ov:] - preds[k][:, :ov]).ravel())
    want = float(np.concatenate(errs).mean())
    assert np.isclose(got, want, rtol=1e-4, atol=1e-5)


def test_benchmark_and_complexity(tiny_setup, tmp_path):
    model, variables, loader = tiny_setup
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    batch = next(iter(loader))
    import jax.numpy as jnp

    image_lr = jnp.asarray(batch["image_lr"])
    image_hr = jnp.asarray(batch["image_hr"])
    tile = {"image_raw_shape": [168, 224], "patch_split_num": [2, 2]}
    out = tester.benchmark(
        variables, image_lr, image_hr,
        cai_mode="m1", process_num=2, tile_cfg=tile, iters=2, warmup=1, repeats=2,
    )
    assert out["fps"] > 0
    # benchmark.txt mirrors the reference artifact (tester.py:400-404)
    assert os.path.exists(tmp_path / "benchmark.txt")
    comp = tester.model_complexity(
        variables,
        image_lr_shape=tuple(image_lr.shape),
        image_hr_shape=tuple(image_hr.shape),
        cai_mode="m1", process_num=2, tile_cfg=tile,
    )
    assert comp["flops"] > 0 and comp["params"] > 0


def test_vis_feat_and_show_gts(tiny_setup, tmp_path):
    model, variables, loader = tiny_setup
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    batch = next(iter(loader))
    out_dir = tester.vis_feat(variables, batch, out_dir=str(tmp_path / "feats"))
    assert os.path.isdir(out_dir) and len(os.listdir(out_dir)) > 0
    # fusion-head intermediates captured (reference hook point
    # tester.py:426-427 refiner_fusion_model.fusion_layers_1[0])
    if "crops_image_hr" in batch and "bboxs" in batch:
        assert any(f.startswith("fusion_") for f in os.listdir(out_dir))
    gt_dir = tester.show_gts(out_dir=str(tmp_path / "gts"))
    assert os.path.isdir(gt_dir) and len(os.listdir(gt_dir)) > 0


def test_run_consistency_rejects_plain_dataset(tiny_setup, tmp_path):
    """A non-consistency dataset (no fixed crop grid) must produce a clear
    config error, not an AttributeError mid-loop."""
    model, variables, loader = tiny_setup
    tester = Tester({}, model, loader, work_dir=str(tmp_path))
    with pytest.raises(ValueError, match="consistency-mode dataset"):
        tester.run_consistency(variables, process_num=2)
