"""ImageDataset reader-branch tests vs the reference semantics
(general_dataset.py:22-159): Middlebury PFM + calibration disparity->depth,
KITTI KB-crop, cityscapes encoded depth, GTA /256 png, the generic bicubic
upsample fallback, and gt/boundary plumbing through __getitem__."""

import os

import numpy as np
import pytest

from patchrefinerv2_tpu.datasets.general import (
    ImageDataset,
    read_general_depth,
    read_general_image,
)


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "I;16" if arr.dtype == np.uint16 else None
    Image.fromarray(arr, mode=mode).save(path)


def _write_pfm(path, data):
    """Little-endian single-channel PFM (utils.read_pfm counterpart)."""
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(data).astype("<f4").tobytes())


def test_mid_reader(tmp_path):
    rng = np.random.RandomState(0)
    gts = tmp_path / "gts"
    calibs = tmp_path / "calibs"
    gts.mkdir()
    calibs.mkdir()
    disp = rng.uniform(10.0, 200.0, (24, 32)).astype(np.float32)
    disp[0, :5] = np.inf  # middlebury invalid marker
    _write_pfm(gts / "a.pfm", disp)
    with open(calibs / "a.txt", "w") as f:
        f.write("cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]\n")
        f.write("cam1=[3997.684 0 1307.839; 0 3997.684 1011.728; 0 0 1]\n")
        f.write("doffs=131.111\n")
        f.write("baseline=193.001\n")

    depth, edges = read_general_depth(str(gts / "a.pfm"), "mid")
    expect = 193.001 * 3997.684 / (disp + 131.111) / 1000.0
    expect[disp == np.inf] = 0.0
    np.testing.assert_allclose(depth, expect.astype(np.float32), rtol=1e-6)
    assert edges.shape == disp.shape
    assert depth[0, 0] == 0.0


def test_kitti_kb_crop(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (375, 1242, 3), np.uint8)
    _write_png(tmp_path / "k.png", img)
    out = read_general_image(str(tmp_path / "k.png"), "kitti")
    assert out.shape == (352, 1216, 3)
    top, left = 375 - 352, (1242 - 1216) // 2
    np.testing.assert_allclose(
        out, img[top : top + 352, left : left + 1216].astype(np.float32) / 255.0
    )


def test_cityscapes_depth_decode(tmp_path):
    enc = np.zeros((8, 8), np.uint16)
    enc[2, 3] = 1 + 256 * 4  # disparity 4.0
    _write_png(tmp_path / "c.png", enc)
    depth, edges = read_general_depth(str(tmp_path / "c.png"), "cityscapes")
    assert depth[0, 0] == 0.0  # zero-encoded pixels sanitized (inf -> 0)
    np.testing.assert_allclose(depth[2, 3], 0.209313 * 2262.52 / 4.0, rtol=1e-5)


def test_gta_depth(tmp_path):
    enc = (np.arange(64, dtype=np.uint16) * 256).reshape(8, 8)
    _write_png(tmp_path / "g.png", enc)
    depth, _ = read_general_depth(str(tmp_path / "g.png"), "gta")
    np.testing.assert_allclose(depth, np.arange(64, dtype=np.float32).reshape(8, 8))


def test_u4k_gt_reader(tmp_path):
    gt = tmp_path / "val_gt"
    factor = tmp_path / "val_factor"
    gt.mkdir()
    factor.mkdir()
    disp = np.random.RandomState(2).uniform(1.0, 64.0, (16, 24)).astype(np.float32)
    np.save(gt / "x.npy", disp)
    with open(factor / "x.txt", "w") as f:
        f.write("480.0\n")
    depth, edges = read_general_depth(str(gt / "x.npy"), "u4k")
    np.testing.assert_allclose(depth, 480.0 / disp, rtol=1e-6)


def test_generic_bicubic_upsample_and_getitem(tmp_path):
    rng = np.random.RandomState(3)
    imgs = tmp_path / "rgb"
    imgs.mkdir()
    _write_png(imgs / "a.png", rng.randint(0, 255, (16, 24, 3), np.uint8))
    ds = ImageDataset(
        rgb_image_dir=str(imgs),
        dataset_name="",
        network_process_size=(32, 48),
        image_resolution=(64, 96),
    )
    s = ds[0]
    assert s["image_hr"].shape == (64, 96, 3)
    assert s["image_lr"].shape == (32, 48, 3)
    assert s["img_file_basename"] == "a"
    assert "depth_gt" not in s


def test_getitem_with_gt(tmp_path):
    rng = np.random.RandomState(4)
    imgs = tmp_path / "rgb"
    gts = tmp_path / "gt"
    imgs.mkdir()
    gts.mkdir()
    _write_png(imgs / "a.png", rng.randint(0, 255, (16, 24, 3), np.uint8))
    enc = (rng.randint(1, 60, (16, 24)).astype(np.uint16) * 256)
    _write_png(gts / "a.png", enc)
    ds = ImageDataset(
        rgb_image_dir=str(imgs),
        gt_dir=str(gts),
        dataset_name="gta",
        network_process_size=(32, 48),
        image_resolution=(64, 96),
    )
    s = ds[0]
    assert s["depth_gt"].shape == (16, 24, 1)
    assert s["boundary"].shape == (16, 24, 1)
    m = ds.get_metrics(s["depth_gt"][..., 0], s["depth_gt"][..., 0],
                       disp_gt_edges=s["boundary"][..., 0])
    assert m["a1"] == pytest.approx(1.0)
