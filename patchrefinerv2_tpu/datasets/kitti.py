"""KITTI dataset (estimator/datasets/kitti_dataset.py:22-296): KB-crop to
352x1216, depth png /256, patch_raw 176x304, garg-crop eval metrics, optional
offline pseudo labels for the semi pipeline."""

from __future__ import annotations

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
class KittiDataset(DepthDataset):
    garg_crop = True
    eigen_crop = False
    dataset_name = "kitti"

    def __init__(
        self,
        mode,
        split,
        transform_cfg,
        min_depth=1e-3,
        max_depth=80,
        data_root="./data/kitti",
        patch_raw_shape=(176, 304),
        do_kb_crop=True,
        with_pseudo_label=False,
        pseudo_label_path=None,
        pre_norm_bbox=True,
        **kwargs,
    ):
        self.mode = mode
        self.data_root = data_root
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.transform_cfg = dict(transform_cfg or {})
        self.network_process_size = tuple(self.transform_cfg.get("network_process_size", [384, 512]))
        self.image_raw_shape = tuple(self.transform_cfg.get("image_raw_shape", [352, 1216]))
        self.patch_raw_shape = tuple(patch_raw_shape)
        self.do_kb_crop = do_kb_crop
        self.with_pseudo_label = with_pseudo_label
        self.pseudo_label_path = pseudo_label_path
        self.pre_norm_bbox = pre_norm_bbox
        self.data_infos = self._load_split(split)

    def _load_split(self, split):
        infos = []
        with open(split) as f:
            for line in f:
                parts = line.strip().split(" ")
                if not parts or parts[0] == "":
                    continue
                img, depth_map = parts[0], parts[1] if len(parts) > 1 else None
                if depth_map is None or depth_map == "None":
                    continue
                info = dict(
                    filename=img,
                    img_path=osp.join(self.data_root, img),
                    depth_map_path=osp.join(self.data_root, depth_map),
                )
                if self.with_pseudo_label:
                    pl = img.replace("/", "_").replace(".png", "_uint16.png").replace(".jpg", "_uint16.png")
                    info["pseudo_label_path"] = osp.join(self.pseudo_label_path, pl)
                infos.append(info)
        return sorted(infos, key=lambda x: x["img_path"])

    def __len__(self):
        return len(self.data_infos)

    def __getitem__(self, idx):
        from PIL import Image

        info = self.data_infos[idx]
        image = np.asarray(Image.open(info["img_path"]).convert("RGB"))
        depth_gt = np.asarray(Image.open(info["depth_map_path"]), np.float32) / 256.0

        if self.do_kb_crop:
            h, w = image.shape[:2]
            top = int(h - 352)
            left = int((w - 1216) / 2)
            image = image[top : top + 352, left : left + 1216]
            depth_gt = depth_gt[top : top + 352, left : left + 1216]

        pseudo_depth = None
        if self.mode == "train" and self.with_pseudo_label:
            pseudo_depth = np.asarray(Image.open(info["pseudo_label_path"]), np.float32) / 256.0

        if self.mode == "train":
            image, (depth_gt, pseudo_depth) = aug_rotate(
                image, [depth_gt, pseudo_depth], self.transform_cfg.get("degree", 1.0)
            )
        image = image.astype(np.float32) / 255.0
        disp_for_edges = depth_gt.copy()
        if self.mode == "train":
            image = aug_color(image)
            image, (depth_gt, pseudo_depth) = aug_flip(image, [depth_gt, pseudo_depth])

        image_lr = resize_hwc(image, self.network_process_size)
        name = osp.splitext(osp.basename(info["filename"]))[0]

        if self.mode == "train":
            ph, pw = self.patch_raw_shape
            crop_img, (crop_depth, crop_pl), (hs, ws) = random_crop(
                image, [depth_gt, pseudo_depth], self.patch_raw_shape
            )
            rh, rw = self.image_raw_shape
            nh, nw = self.network_process_size
            if self.pre_norm_bbox:
                bbox = np.asarray(
                    [ws / rw * nw, hs / rh * nh, (ws + pw) / rw * nw, (hs + ph) / rh * nh],
                    np.float32,
                )
            else:
                bbox = np.asarray([ws, hs, ws + pw, hs + ph], np.float32)
            out = {
                "image_lr": image_lr,
                "crops_image_hr": resize_hwc(crop_img, self.network_process_size),
                "depth_gt": depth_gt[..., None],
                "crop_depths": crop_depth[..., None],
                "bboxs": bbox,
                "img_file_basename": name,
            }
            if crop_pl is not None:
                out["pseudo_label"] = crop_pl[..., None]
            return out

        boundary = get_boundaries(disp_for_edges, th=1, dilation=0)
        return {
            "image_lr": image_lr,
            "image_hr": image,
            "depth_gt": depth_gt[..., None],
            "boundary": boundary.astype(np.float32),
            "img_file_basename": name,
        }
