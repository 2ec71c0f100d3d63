"""Directory-of-images inference dataset
(estimator/datasets/general_dataset.py:22-246).

Per-dataset RGB readers (general_dataset.py:22-62): u4k raw blobs,
Middlebury images bicubic-upsampled to the working resolution
(align_corners=True), cityscapes pngs as-is, KITTI KB-crop (352x1216),
and a generic bicubic-upsample fallback. Optional ``gt_dir`` activates the
per-dataset DepthMap readers (general_dataset.py:76-159): u4k disparity
npy + val_factor, GTA png/256, ETH3D float32 raw, Middlebury PFM +
calibration-file disparity->depth, and cityscapes encoded-png depth —
each with boundary edges for the edge metrics. Drives
``tools/test.py --test-type general``.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from patchrefinerv2_tpu.registry import DATASETS
from patchrefinerv2_tpu.datasets.base import DepthDataset
from patchrefinerv2_tpu.datasets.transforms import resize_hwc
from patchrefinerv2_tpu.datasets.utils import read_pfm
from patchrefinerv2_tpu.evaluation.metrics import get_boundaries

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".raw")
GT_EXTS = IMG_EXTS + (".npy", ".pfm", ".exr")


def read_general_image(path: str, dataset_name: str,
                       image_resolution=(2160, 3840)) -> np.ndarray:
    """RGB reader branches (general_dataset.py:22-62); float32 HWC in
    [0, 1]."""
    import cv2

    if dataset_name == "u4k" or path.endswith(".raw"):
        img = np.fromfile(path, dtype=np.uint8).reshape(2160, 3840, 3)
        img = img[:, :, ::-1].astype(np.float32) / 255.0  # BGR -> RGB
    elif dataset_name == "cityscapes":
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    elif dataset_name == "kitti":
        # KB crop to 352x1216 (general_dataset.py:39-53)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        top, left = int(h - 352), int((w - 1216) / 2)
        img = img[top : top + 352, left : left + 1216]
        img = img.astype(np.float32) / 255.0
    else:  # 'mid' and the generic fallback: bicubic upsample to 4K
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        if img.shape[:2] != tuple(image_resolution):
            img = resize_hwc(img, tuple(image_resolution), mode="bicubic",
                             align_corners=True)
            img = np.clip(img, 0.0, 1.0)  # bicubic lobes overshoot [0, 1]
    return np.ascontiguousarray(img, dtype=np.float32)


def read_general_depth(gt_path: str, dataset_name: str):
    """GT depth reader branches (general_dataset.py:76-159): returns
    (depth_gt, boundary_edges) float32 arrays."""
    import cv2

    if dataset_name == "u4k":
        factor_path = gt_path.replace("val_gt", "val_factor")
        factor_path = factor_path.replace(".npy", ".txt")
        with open(factor_path) as f:
            df = float(f.readline())
        gt_disp = np.load(gt_path).astype(np.float32)
        edges = get_boundaries(gt_disp, th=1, dilation=0)
        with np.errstate(divide="ignore"):
            depth = df / gt_disp
        depth = np.nan_to_num(depth, posinf=0.0, neginf=0.0, nan=0.0)
    elif dataset_name == "gta":
        depth = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED)
        depth = np.asarray(depth, np.float32) / 256.0
        edges = get_boundaries(depth, th=1, dilation=0)
    elif dataset_name == "eth3d":
        depth = np.fromfile(gt_path, dtype=np.float32).reshape(4032, 6048)
        depth = np.nan_to_num(depth, posinf=0.0, neginf=0.0, nan=0.0)
        edges = get_boundaries(depth, th=1, dilation=0)
    elif dataset_name == "mid":
        # Middlebury calibration: cam0=[f ...] / doffs= / baseline=
        # (general_dataset.py:113-124)
        calib_path = gt_path.replace("gts", "calibs").replace(".pfm", ".txt")
        with open(calib_path) as f:
            lines = f.readlines()
        focal = float(lines[0].strip().split(" ")[0].split("[")[1])
        doffs = float(lines[2].strip().split("=")[1])
        base = float(lines[3].strip().split("=")[1])
        disp, _scale = read_pfm(gt_path)
        disp = disp.astype(np.float32)
        invalid = disp == np.inf
        depth = (base * focal) / (disp + doffs) / 1000.0
        depth[invalid] = 0.0
        disp_c = disp.copy()
        disp_c[invalid] = 0.0
        edges = get_boundaries(disp_c, th=1, dilation=0)
    elif dataset_name == "cityscapes":
        img_d = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED).astype(np.float32)
        img_d[img_d > 0] = (img_d[img_d > 0] - 1) / 256.0
        with np.errstate(divide="ignore"):
            depth = (0.209313 * 2262.52) / img_d
        depth = np.nan_to_num(depth, posinf=0.0, neginf=0.0, nan=0.0)
        edges = get_boundaries(depth, th=1, dilation=0)
    else:
        raise NotImplementedError(f"no GT reader for dataset {dataset_name!r}")
    return depth.astype(np.float32), edges.astype(np.float32)


@DATASETS.register_module()
class ImageDataset(DepthDataset):
    def __init__(
        self,
        rgb_image_dir: str,
        dataset_name: str = "",
        gt_dir: str | None = None,
        network_process_size=(384, 512),
        image_raw_shape=(2160, 3840),
        image_resolution=None,
        min_depth: float = 1e-3,
        max_depth: float = 80,
        **kwargs,
    ):
        self.rgb_image_dir = rgb_image_dir
        self.dataset_name = dataset_name
        self.network_process_size = tuple(network_process_size)
        self.image_raw_shape = tuple(image_resolution or image_raw_shape)
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.files = sorted(
            f for f in os.listdir(rgb_image_dir) if f.lower().endswith(IMG_EXTS)
        )
        self.gt_dir = gt_dir
        if gt_dir is not None:
            # gt and rgb share basenames, so sorted lists align
            # (general_dataset.py:184)
            self.gt_files = sorted(
                f for f in os.listdir(gt_dir) if f.lower().endswith(GT_EXTS)
            )

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        path = osp.join(self.rgb_image_dir, self.files[idx])
        image = read_general_image(path, self.dataset_name, self.image_raw_shape)
        image_lr = resize_hwc(image, self.network_process_size)
        name = osp.splitext(osp.basename(path))[0]
        out = {
            "image_lr": image_lr,
            "image_hr": image.astype(np.float32),
            "img_file_basename": name,
        }
        if self.gt_dir is not None:
            gt_path = osp.join(self.gt_dir, self.gt_files[idx])
            depth, edges = read_general_depth(gt_path, self.dataset_name)
            out["depth_gt"] = depth[..., None]
            out["boundary"] = edges[..., None]
        return out
