"""UnrealStereo4K dataset (estimator/datasets/u4k_dataset.py:20-371).

Raw uint8 BGR blobs (2160x3840x3) + disparity .npy; depth = base*f / disp
from the stereo extrinsics (:99-129). Train: rotate -> BGR->RGB /255 ->
color/flip aug -> random patch_raw crop -> resize crop to
network_process_size + pre-normalized bbox (:131-204). Eval: full-res HWC
image + lr resize + disparity boundary edges (:216-217).

Layout difference from the reference: everything stays HWC numpy (NHWC on
device); resizes use the shared torch-exact matrices.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from patchrefinerv2_tpu.registry import DATASETS
from patchrefinerv2_tpu.datasets.base import DepthDataset
from patchrefinerv2_tpu.datasets.transforms import (
    aug_color,
    aug_flip,
    aug_rotate,
    random_crop,
    resize_hwc,
)
from patchrefinerv2_tpu.evaluation.metrics import get_boundaries


@DATASETS.register_module()
class UnrealStereo4kDataset(DepthDataset):
    def __init__(
        self,
        mode: str,
        data_root: str,
        split: str,
        min_depth: float = 1e-3,
        max_depth: float = 80,
        transform_cfg: dict | None = None,
        patch_raw_shape=(540, 960),
        pre_norm_bbox: bool = True,
        consistency: bool = False,
        overlap: int = 270,
        **kwargs,
    ):
        self.mode = mode
        self.data_root = data_root
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.transform_cfg = dict(transform_cfg or {})
        self.network_process_size = tuple(
            self.transform_cfg.get("network_process_size", [384, 512])
        )
        self.image_raw_shape = tuple(
            self.transform_cfg.get("image_raw_shape", [2160, 3840])
        )
        self.degree = float(self.transform_cfg.get("degree", 1.0))
        self.random_crop_flag = bool(self.transform_cfg.get("random_crop", True))
        self.patch_raw_shape = tuple(patch_raw_shape)
        self.pre_norm_bbox = pre_norm_bbox
        self.consistency = consistency
        self.overlap = overlap
        if consistency:
            # fixed 4x4 overlapping grid (u4k_dataset.py:62-65)
            ov = overlap
            self.h_start_list = [
                int(0 + 3 * ov / 2), int(540 + ov / 2), int(1080 - ov / 2), int(1620 - 3 * ov / 2)
            ]
            self.w_start_list = [
                int(0 + 3 * ov / 2), int(960 + ov / 2), int(1920 - ov / 2), int(2880 - 3 * ov / 2)
            ]
        self.data_infos = self._load_split(split)

    def _load_split(self, split: str) -> list[dict]:
        infos = []
        with open(split, "r") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                img_rel = line.split(" ")[0]
                info = {"filename": img_rel}
                info["img_path"] = osp.join(self.data_root, img_rel.lstrip("/"))
                disp_rel = img_rel.replace("Image0", "Disp0").rsplit(".", 1)[0] + ".npy"
                info["depth_map_path"] = osp.join(self.data_root, disp_rel.lstrip("/"))
                ext_l = info["depth_map_path"].replace("Disp0", "Extrinsics0").replace(
                    ".npy", ".txt"
                )
                ext_r = info["depth_map_path"].replace("Disp0", "Extrinsics1").replace(
                    ".npy", ".txt"
                )
                if osp.exists(ext_l) and osp.exists(ext_r):
                    with open(ext_l) as fl, open(ext_r) as fr:
                        l_lines, r_lines = fl.readlines(), fr.readlines()
                    focal = float(l_lines[0].split(" ")[0])
                    base = abs(
                        float(l_lines[1].split(" ")[3]) - float(r_lines[1].split(" ")[3])
                    )
                    info["depth_factor"] = base * focal
                else:
                    info["depth_factor"] = 1.0
                infos.append(info)
        return sorted(infos, key=lambda x: x["img_path"])

    def __len__(self):
        return len(self.data_infos)

    def _norm_bbox(self, ws, hs, we, he):
        rh, rw = self.image_raw_shape
        ph, pw = self.network_process_size
        return np.asarray(
            [ws / rw * pw, hs / rh * ph, we / rw * pw, he / rh * ph], np.float32
        )

    def __getitem__(self, idx):
        info = self.data_infos[idx]
        image = np.fromfile(info["img_path"], dtype=np.uint8).reshape(2160, 3840, 3)
        disp_gt = np.load(info["depth_map_path"], mmap_mode="c").astype(np.float32)
        depth_gt = info["depth_factor"] / disp_gt

        if self.mode == "train":
            image, (depth_gt, disp_gt) = aug_rotate(image, [depth_gt, disp_gt], self.degree)
            image = image.astype(np.float32)[:, :, ::-1] / 255.0  # BGR -> RGB
        else:
            # eval path has no PIL round-trip: native BGR->RGB + /255
            from patchrefinerv2_tpu.datasets import native

            fast = native.load_raw_bgr_as_rgb_f32(info["img_path"])
            if fast is not None and self.degree is not None:
                image = fast
            else:
                image = image.astype(np.float32)[:, :, ::-1] / 255.0

        if self.mode == "train":
            image = aug_color(image)
            image, (depth_gt, disp_gt) = aug_flip(image, [depth_gt, disp_gt])

        image_lr = resize_hwc(image, self.network_process_size)
        name = osp.splitext(info["filename"])[0].replace("/", "_").lstrip("_")

        if self.mode == "train" and self.consistency:
            # 16 fixed overlapping crops per image (u4k_dataset.py:158-184)
            ph, pw = self.patch_raw_shape
            crops, depths, bboxs = [], [], []
            for hs in self.h_start_list:
                for ws in self.w_start_list:
                    crop = image[hs : hs + ph, ws : ws + pw]
                    crops.append(resize_hwc(crop, self.network_process_size))
                    depths.append(depth_gt[hs : hs + ph, ws : ws + pw, None])
                    if self.pre_norm_bbox:
                        bboxs.append(self._norm_bbox(ws, hs, ws + pw, hs + ph))
                    else:
                        bboxs.append(np.asarray([ws, hs, ws + pw, hs + ph], np.float32))
            return {
                "image_lr": image_lr,
                "crops_image_hr": np.stack(crops).astype(np.float32),
                "depth_gt": depth_gt[..., None].astype(np.float32),
                "crop_depths": np.stack(depths).astype(np.float32),
                "bboxs": np.stack(bboxs),
                "img_file_basename": name,
            }

        if self.mode == "train":
            ph, pw = self.patch_raw_shape
            crop_img, (crop_depth, _), (hs, ws) = random_crop(
                image, [depth_gt, disp_gt], self.patch_raw_shape
            )
            crop_resized = resize_hwc(crop_img, self.network_process_size)
            if self.pre_norm_bbox:
                bbox = self._norm_bbox(ws, hs, ws + pw, hs + ph)
            else:
                bbox = np.asarray([ws, hs, ws + pw, hs + ph], np.float32)
            return {
                "image_lr": image_lr,
                "crops_image_hr": crop_resized,
                "depth_gt": depth_gt[..., None].astype(np.float32),
                "crop_depths": crop_depth[..., None].astype(np.float32),
                "bboxs": bbox,
                "img_file_basename": name,
            }

        boundary = get_boundaries(disp_gt, th=1, dilation=0)
        return {
            "image_lr": image_lr,
            "image_hr": image.astype(np.float32),
            "depth_gt": depth_gt[..., None].astype(np.float32),
            "boundary": boundary.astype(np.float32),
            "img_file_basename": name,
        }
