"""Synthetic in-memory dataset for tests and benchmarks (no reference
analog — stands in for UnrealStereo4k when no data is mounted)."""

from __future__ import annotations

import numpy as np

from patchrefinerv2_tpu.registry import DATASETS
from patchrefinerv2_tpu.datasets.base import DepthDataset
from patchrefinerv2_tpu.datasets.transforms import resize_hwc


@DATASETS.register_module()
class SyntheticDataset(DepthDataset):
    def __init__(
        self,
        mode: str = "train",
        length: int = 8,
        image_raw_shape=(2160, 3840),
        network_process_size=(384, 512),
        patch_raw_shape=(540, 960),
        min_depth: float = 1e-3,
        max_depth: float = 80,
        seed: int = 0,
        consistency: bool = False,
        overlap: int | None = None,
        missing_holes: bool = False,
        **kwargs,
    ):
        # missing_holes: zero out a random rectangle of each depth map —
        # stands in for real sensors' gt==0 holes so the only_missing_area
        # loss paths (losses.missing_area_sampling_mask) see a live mask
        self.missing_holes = missing_holes
        self.mode = mode
        self.length = length
        self.image_raw_shape = tuple(image_raw_shape)
        self.network_process_size = tuple(network_process_size)
        self.patch_raw_shape = tuple(patch_raw_shape)
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.seed = seed
        self.consistency = consistency
        if consistency:
            # the u4k fixed 4x4 half-overlapping grid (u4k_dataset.py:159-161)
            # generalized to this dataset's geometry: crop = patch_raw_shape,
            # overlap defaults to half a crop
            h, w = self.image_raw_shape
            ph, pw = self.patch_raw_shape
            self.overlap = int(overlap if overlap is not None else ph // 2)
            ov = self.overlap
            self.h_start_list = [
                int(0 + 3 * ov / 2), int(h // 4 + ov / 2),
                int(2 * h // 4 - ov / 2), int(3 * h // 4 - 3 * ov / 2),
            ]
            self.w_start_list = [
                int(0 + 3 * ov / 2), int(w // 4 + ov / 2),
                int(2 * w // 4 - ov / 2), int(3 * w // 4 - 3 * ov / 2),
            ]

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed + idx)
        h, w = self.image_raw_shape
        ph, pw = self.patch_raw_shape
        nh, nw = self.network_process_size
        image = rng.rand(h, w, 3).astype(np.float32)
        depth = (1.0 + 20.0 * rng.rand(h, w)).astype(np.float32)
        if self.missing_holes:
            hh, ww = rng.randint(h // 8, h // 3 + 1), rng.randint(w // 8, w // 3 + 1)
            top, left = rng.randint(0, h - hh), rng.randint(0, w - ww)
            depth[top : top + hh, left : left + ww] = 0.0
        image_lr = resize_hwc(image, (nh, nw))
        if self.mode == "train" and self.consistency:
            # 16 fixed overlapping crops (u4k_dataset.py:158-184 pattern)
            crops, depths, bboxs = [], [], []
            for hs in self.h_start_list:
                for ws in self.w_start_list:
                    crop = image[hs : hs + ph, ws : ws + pw]
                    crops.append(resize_hwc(crop, (nh, nw)))
                    depths.append(depth[hs : hs + ph, ws : ws + pw, None])
                    bboxs.append(np.asarray(
                        [ws / w * nw, hs / h * nh, (ws + pw) / w * nw, (hs + ph) / h * nh],
                        np.float32,
                    ))
            return {
                "image_lr": image_lr,
                "crops_image_hr": np.stack(crops).astype(np.float32),
                "depth_gt": depth[..., None],
                "crop_depths": np.stack(depths).astype(np.float32),
                "bboxs": np.stack(bboxs),
                "img_file_basename": f"synthetic_{idx:04d}",
            }
        if self.mode == "train":
            hs = rng.randint(0, h - ph + 1)
            ws = rng.randint(0, w - pw + 1)
            crop = image[hs : hs + ph, ws : ws + pw]
            crop_depth = depth[hs : hs + ph, ws : ws + pw]
            bbox = np.asarray(
                [ws / w * nw, hs / h * nh, (ws + pw) / w * nw, (hs + ph) / h * nh],
                np.float32,
            )
            return {
                "image_lr": image_lr,
                "crops_image_hr": resize_hwc(crop, (nh, nw)),
                "depth_gt": depth[..., None],
                "crop_depths": crop_depth[..., None],
                "bboxs": bbox,
                "img_file_basename": f"synthetic_{idx:04d}",
            }
        return {
            "image_lr": image_lr,
            "image_hr": image,
            "depth_gt": depth[..., None],
            "img_file_basename": f"synthetic_{idx:04d}",
        }
