"""ETH3D dataset (estimator/datasets/eth_dataset.py:23-403): 4032x6048
images with float32 raw depth dumps; edge-split eval like ScanNet."""

from __future__ import annotations

import os.path as osp

import numpy as np

from patchrefinerv2_tpu.registry import DATASETS
from patchrefinerv2_tpu.datasets.scannet import ScanNetDataset


@DATASETS.register_module()
class ETHDataset(ScanNetDataset):
    dataset_name = "eth3d"

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("patch_raw_shape", (2016, 3024))
        tc = dict(kwargs.get("transform_cfg") or {})
        tc.setdefault("image_raw_shape", [4032, 6048])
        kwargs["transform_cfg"] = tc
        super().__init__(*args, **kwargs)

    def __getitem__(self, idx):
        # float32 raw depth blobs instead of png (eth_dataset.py:112-130)
        info = self.data_infos[idx]
        if info["depth_map_path"].endswith((".raw", ".bin")):
            from PIL import Image

            image = np.asarray(Image.open(info["img_path"]).convert("RGB"))
            depth = np.fromfile(info["depth_map_path"], dtype=np.float32).reshape(
                image.shape[0], image.shape[1]
            )
            depth = np.nan_to_num(depth, posinf=0.0, neginf=0.0, nan=0.0)
            return self._build_item(info, image, depth)
        return super().__getitem__(idx)

    def _build_item(self, info, image, depth_gt):
        from patchrefinerv2_tpu.datasets.transforms import resize_hwc
        from patchrefinerv2_tpu.evaluation.metrics import get_boundaries

        if image.shape[:2] != tuple(self.image_raw_shape):
            image = (
                resize_hwc(image.astype(np.float32) / 255.0, self.image_raw_shape) * 255
            ).astype(np.uint8)
        image = image.astype(np.float32) / 255.0
        image_lr = resize_hwc(image, self.network_process_size)
        boundary = get_boundaries(depth_gt, th=1, dilation=0)
        name = osp.splitext(osp.basename(info["filename"]))[0]
        return {
            "image_lr": image_lr,
            "image_hr": image,
            "depth_gt": depth_gt[..., None],
            "boundary": boundary.astype(np.float32),
            "img_file_basename": name,
        }
