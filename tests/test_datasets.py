"""Dataset-layer tests with synthetic on-disk fixtures.

Covers the reference data contracts (SURVEY.md §2.2): UnrealStereo4K raw
blobs + extrinsics->depth (u4k_dataset.py:99-129), KITTI KB-crop + /256
depth PNGs (kitti_dataset.py:219-220), Cityscapes camera-json disparity ->
depth + border filtering (cityscapes_dataset.py:149-165), the Middlebury
PFM reader, and the host augmentations.
"""

import json
import os

import numpy as np
import pytest

from patchrefinerv2_tpu.datasets.transforms import (
    aug_color,
    aug_flip,
    random_crop,
    resize_hwc,
)
from patchrefinerv2_tpu.datasets.utils import read_pfm


# --------------------------------------------------------------- fixtures
def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "I;16" if arr.dtype == np.uint16 else None
    Image.fromarray(arr, mode=mode).save(path)


@pytest.fixture(scope="module")
def u4k_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("u4k")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (2160, 3840, 3), np.uint8)
    (root / "00000" / "Image0").mkdir(parents=True)
    (root / "00000" / "Disp0").mkdir(parents=True)
    img.tofile(root / "00000" / "Image0" / "000.raw")
    disp = rng.uniform(1.0, 64.0, (2160, 3840)).astype(np.float32)
    np.save(root / "00000" / "Disp0" / "000.npy", disp)
    for name, tx in [("Extrinsics0", 0.0), ("Extrinsics1", -0.5)]:
        d = root / "00000" / name
        d.mkdir()
        with open(d / "000.txt", "w") as f:
            f.write("1000.0 0.0 960.0\n")
            f.write(f"0.0 1.0 0.0 {tx}\n")
    split = root / "split.txt"
    with open(split, "w") as f:
        f.write("/00000/Image0/000.raw\n")
    return root, split, disp


def test_u4k_train_sample(u4k_root):
    from patchrefinerv2_tpu.datasets.u4k import UnrealStereo4kDataset

    root, split, disp = u4k_root
    ds = UnrealStereo4kDataset(
        mode="train",
        data_root=str(root),
        split=str(split),
        transform_cfg=dict(network_process_size=[384, 512], degree=0.0),
        patch_raw_shape=(540, 960),
    )
    assert len(ds) == 1
    s = ds[0]
    assert s["image_lr"].shape == (384, 512, 3)
    assert s["crops_image_hr"].shape == (384, 512, 3)
    assert s["depth_gt"].shape == (2160, 3840, 1)
    assert s["crop_depths"].shape == (540, 960, 1)
    # depth = base*focal/disp with base=0.5, focal=1000 (u4k_dataset.py:99-129)
    assert np.isclose(s["depth_gt"][..., 0].max(), (0.5 * 1000.0 / disp).max(), rtol=1e-4)
    # pre-normalized bbox lands in the 384x512 process frame
    x1, y1, x2, y2 = s["bboxs"]
    assert 0 <= x1 < x2 <= 512 and 0 <= y1 < y2 <= 384
    assert np.isclose(x2 - x1, 960 / 3840 * 512, atol=1e-3)
    assert np.isclose(y2 - y1, 540 / 2160 * 384, atol=1e-3)


def test_u4k_eval_sample(u4k_root):
    from patchrefinerv2_tpu.datasets.u4k import UnrealStereo4kDataset

    root, split, _ = u4k_root
    ds = UnrealStereo4kDataset(
        mode="infer",
        data_root=str(root),
        split=str(split),
        transform_cfg=dict(network_process_size=[384, 512]),
    )
    s = ds[0]
    assert s["image_hr"].shape == (2160, 3840, 3)
    assert s["image_hr"].dtype == np.float32
    assert 0.0 <= s["image_hr"].min() and s["image_hr"].max() <= 1.0
    assert s["boundary"].shape == (2160, 3840)
    # eval image is BGR->RGB of the raw blob
    raw = np.fromfile(os.path.join(str(root), "00000/Image0/000.raw"), np.uint8)
    raw = raw.reshape(2160, 3840, 3)
    np.testing.assert_allclose(
        s["image_hr"][0, 0], raw[0, 0, ::-1].astype(np.float32) / 255.0, atol=1e-6
    )


def test_kitti_kb_crop_and_depth_scale(tmp_path):
    from patchrefinerv2_tpu.datasets.kitti import KittiDataset

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (370, 1226, 3), np.uint8)
    depth = (rng.uniform(0, 80, (370, 1226)) * 256).astype(np.uint16)
    _write_png(str(tmp_path / "img" / "a.png"), img)
    _write_png(str(tmp_path / "gt" / "a.png"), depth)
    split = tmp_path / "split.txt"
    split.write_text("img/a.png gt/a.png\n")

    ds = KittiDataset(
        mode="infer",
        split=str(split),
        data_root=str(tmp_path),
        transform_cfg=dict(network_process_size=[384, 512]),
    )
    s = ds[0]
    # KB-crop: bottom 352 rows, center 1216 cols (kitti_dataset.py KB-crop)
    assert s["image_hr"].shape == (352, 1216, 3)
    assert s["depth_gt"].shape == (352, 1216, 1)
    top, left = 370 - 352, (1226 - 1216) // 2
    np.testing.assert_allclose(
        s["depth_gt"][..., 0],
        depth[top : top + 352, left : left + 1216].astype(np.float32) / 256.0,
        atol=1e-6,
    )


def test_cityscapes_depth_and_border_filter(tmp_path):
    from patchrefinerv2_tpu.datasets.cityscapes import CityScapesDataset

    rng = np.random.RandomState(2)
    h, w = 256, 512  # small stand-in; geometry is relative
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    # cityscapes disparity encoding: stored = disp*256 + 1, 0 = invalid
    disp = rng.uniform(2.0, 60.0, (h, w)).astype(np.float32)
    stored = (disp * 256.0 + 1.0).astype(np.uint16)
    stored[0, 0] = 0  # one invalid pixel
    _write_png(str(tmp_path / "leftImg8bit" / "val" / "x" / "a_leftImg8bit.png"), img)
    _write_png(str(tmp_path / "disparity" / "val" / "x" / "a_disparity.png"), stored)
    cam_dir = tmp_path / "camera" / "val" / "x"
    cam_dir.mkdir(parents=True)
    with open(cam_dir / "a_camera.json", "w") as f:
        json.dump({"extrinsic": {"baseline": 0.22}, "intrinsic": {"fx": 2262.52}}, f)
    split = tmp_path / "split.txt"
    split.write_text(
        "leftImg8bit/val/x/a_leftImg8bit.png disparity/val/x/a_disparity.png\n"
    )

    ds = CityScapesDataset(
        mode="infer",
        split=str(split),
        data_root=str(tmp_path),
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(network_process_size=[384, 512]),
        filter_sky=False,
    )
    s = ds[0]
    d = s["depth_gt"][..., 0]
    # borders invalidated: bottom quarter + left 1/16 (cityscapes_dataset.py:161-165)
    assert (d[-h // 4 :, :] == -1.0).all()
    assert (d[:, : w // 16] == -1.0).all()
    # interior depth = baseline*fx/disp
    ref = 0.22 * 2262.52 / disp
    inner = d[h // 8 : h // 4, w // 8 : w // 4]
    np.testing.assert_allclose(
        inner, ref[h // 8 : h // 4, w // 8 : w // 4], rtol=2e-2
    )


def test_read_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    data = rng.randn(7, 9).astype(np.float32)
    path = tmp_path / "d.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n9 7\n-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)
    got, scale = read_pfm(str(path))
    assert scale == 1.0
    np.testing.assert_array_equal(got, data)


def test_transforms_contract():
    rng = np.random.RandomState(4)
    img = rng.rand(64, 96, 3).astype(np.float32)
    depth = rng.rand(64, 96).astype(np.float32)

    out, (d2,) = aug_flip(img, [depth])
    assert out.shape == img.shape and d2.shape == depth.shape
    # flip is consistent between image and depth
    if not np.array_equal(out, img):
        np.testing.assert_array_equal(out, img[:, ::-1])
        np.testing.assert_array_equal(d2, depth[:, ::-1])

    c = aug_color(img)
    assert c.shape == img.shape and c.dtype == np.float32

    crop, (dc,), (hs, ws) = random_crop(img, [depth], (32, 48))
    assert crop.shape == (32, 48, 3) and dc.shape == (32, 48)
    assert 0 <= hs <= 32 and 0 <= ws <= 48
    np.testing.assert_array_equal(crop, img[hs : hs + 32, ws : ws + 48])

    r = resize_hwc(img, (32, 48))
    assert r.shape == (32, 48, 3)


def test_scannet_depth_scale_and_shapes(tmp_path):
    from patchrefinerv2_tpu.datasets.scannet import ScanNetDataset

    rng = np.random.RandomState(7)
    h, w = 144, 192  # small stand-in for 1440x1920 (same aspect)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    depth_mm = (rng.uniform(0.3, 9.5, (h, w)) * 1000).astype(np.uint16)
    _write_png(str(tmp_path / "img" / "s.png"), img)
    _write_png(str(tmp_path / "gt" / "s.png"), depth_mm)
    split = tmp_path / "split.txt"
    split.write_text("img/s.png gt/s.png\n")

    ds = ScanNetDataset(
        mode="infer",
        split=str(split),
        data_root=str(tmp_path),
        min_depth=1e-3,
        max_depth=10,
        transform_cfg=dict(
            network_process_size=[384, 512], image_raw_shape=[h, w]
        ),
    )
    s = ds[0]
    assert s["image_hr"].shape == (h, w, 3)
    # depth png is millimetres / 1000 (scannet_dataset.py depth_scale)
    np.testing.assert_allclose(
        s["depth_gt"][..., 0], depth_mm.astype(np.float32) / 1000.0, atol=1e-6
    )
    assert s["image_lr"].shape == (384, 512, 3)


def test_eth3d_float32_raw_depth(tmp_path):
    from patchrefinerv2_tpu.datasets.eth3d import ETHDataset

    rng = np.random.RandomState(8)
    h, w = 126, 189  # small stand-in for 4032x6048 (same aspect)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    depth = rng.uniform(0.5, 60.0, (h, w)).astype(np.float32)
    depth[0, 0] = np.inf  # raw blobs carry inf at missing rays
    _write_png(str(tmp_path / "img" / "e.png"), img)
    (tmp_path / "gt").mkdir()
    depth.tofile(tmp_path / "gt" / "e.raw")
    split = tmp_path / "split.txt"
    split.write_text("img/e.png gt/e.raw\n")

    ds = ETHDataset(
        mode="infer",
        split=str(split),
        data_root=str(tmp_path),
        min_depth=1e-3,
        max_depth=80,
        transform_cfg=dict(
            network_process_size=[384, 512], image_raw_shape=[h, w]
        ),
    )
    s = ds[0]
    d = s["depth_gt"][..., 0]
    assert np.isfinite(d).all()  # inf sanitized (eth_dataset.py nan_to_num)
    assert d[0, 0] == 0.0
    np.testing.assert_allclose(d[1:, :], depth[1:, :], atol=1e-6)


def test_dataloader_pooled_workers_order_and_content():
    """num_workers > 1 must yield the same batches in the same order as the
    single-thread path (in-order sliding-window pool)."""
    from patchrefinerv2_tpu.datasets.base import DataLoader
    from patchrefinerv2_tpu.registry import DATASETS

    ds = DATASETS.build(dict(
        type="SyntheticDataset", mode="train", length=7,
        image_raw_shape=(64, 96), network_process_size=(32, 48),
        patch_raw_shape=(32, 48),
    ))
    a = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3, num_prefetch=0))
    b = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        num_prefetch=2, num_workers=4))
    assert len(a) == len(b) == 3  # drop_last
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        np.testing.assert_array_equal(ba["image_lr"], bb["image_lr"])
        np.testing.assert_array_equal(ba["crop_depths"], bb["crop_depths"])
