"""Directory-of-images inference dataset
(estimator/datasets/general_dataset.py:22-246).

Per-dataset readers: u4k raw blobs, cityscapes/kitti pngs, generic images
bicubic-upsampled to 4K (general_dataset.py:50-62). Drives
``tools/test.py --test-type general``.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from patchrefinerv2_tpu.registry import DATASETS
from patchrefinerv2_tpu.datasets.base import DepthDataset
from patchrefinerv2_tpu.datasets.transforms import resize_hwc

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".raw")


@DATASETS.register_module()
class ImageDataset(DepthDataset):
    def __init__(
        self,
        rgb_image_dir: str,
        dataset_name: str = "",
        network_process_size=(384, 512),
        image_raw_shape=(2160, 3840),
        min_depth: float = 1e-3,
        max_depth: float = 80,
        **kwargs,
    ):
        self.rgb_image_dir = rgb_image_dir
        self.dataset_name = dataset_name
        self.network_process_size = tuple(network_process_size)
        self.image_raw_shape = tuple(image_raw_shape)
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.files = sorted(
            osp.join(rgb_image_dir, f)
            for f in os.listdir(rgb_image_dir)
            if f.lower().endswith(IMG_EXTS)
        )

    def __len__(self):
        return len(self.files)

    def _read(self, path: str) -> np.ndarray:
        import cv2

        if path.endswith(".raw"):  # u4k blob (general_dataset.py:24-33)
            img = np.fromfile(path, dtype=np.uint8).reshape(2160, 3840, 3)
            img = img[:, :, ::-1]  # BGR -> RGB
        else:
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img.astype(np.float32) / 255.0

    def __getitem__(self, idx):
        path = self.files[idx]
        image = self._read(path)
        if self.dataset_name in ("", "general"):
            # generic images are bicubic-upsampled to the raw working size
            # (general_dataset.py:50-62)
            if image.shape[:2] != self.image_raw_shape:
                image = resize_hwc(image, self.image_raw_shape, mode="bicubic",
                                   align_corners=False)
                image = np.clip(image, 0.0, 1.0)
        image_lr = resize_hwc(image, self.network_process_size)
        name = osp.splitext(osp.basename(path))[0]
        return {
            "image_lr": image_lr,
            "image_hr": image.astype(np.float32),
            "img_file_basename": name,
        }
