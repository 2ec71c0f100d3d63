"""ScanNet++ dataset (estimator/datasets/scannet_dataset.py:25-404):
1440x1920 frames, depth png /1000, patch_raw 720x960, edge/non-edge split
metrics; optional offline pseudo labels."""

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
from patchrefinerv2_tpu.evaluation.metrics import compute_metrics, get_boundaries


@DATASETS.register_module()
class ScanNetDataset(DepthDataset):
    dataset_name = "scannet"

    def __init__(
        self,
        mode,
        split,
        transform_cfg,
        min_depth=1e-3,
        max_depth=10,
        data_root="./data/scannet",
        patch_raw_shape=(720, 960),
        depth_scale=1000.0,
        with_pseudo_label=False,
        pseudo_label_path=None,
        pre_norm_bbox=True,
        **kwargs,
    ):
        self.mode = mode
        self.data_root = data_root
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.depth_scale = depth_scale
        self.transform_cfg = dict(transform_cfg or {})
        self.network_process_size = tuple(self.transform_cfg.get("network_process_size", [384, 512]))
        self.image_raw_shape = tuple(self.transform_cfg.get("image_raw_shape", [1440, 1920]))
        self.patch_raw_shape = tuple(patch_raw_shape)
        self.with_pseudo_label = with_pseudo_label
        self.pseudo_label_path = pseudo_label_path
        self.pre_norm_bbox = pre_norm_bbox
        self.data_infos = self._load_split(split)

    def _load_split(self, split):
        infos = []
        with open(split) as f:
            for line in f:
                parts = line.strip().split(" ")
                if len(parts) < 2:
                    continue
                info = dict(
                    filename=parts[0],
                    img_path=osp.join(self.data_root, parts[0]),
                    depth_map_path=osp.join(self.data_root, parts[1]),
                )
                if self.with_pseudo_label:
                    pl = parts[0].replace("/", "_").rsplit(".", 1)[0] + "_uint16.png"
                    info["pseudo_label_path"] = osp.join(self.pseudo_label_path, pl)
                infos.append(info)
        return sorted(infos, key=lambda x: x["img_path"])

    def __len__(self):
        return len(self.data_infos)

    def __getitem__(self, idx):
        from PIL import Image

        info = self.data_infos[idx]
        image = np.asarray(Image.open(info["img_path"]).convert("RGB"))
        depth_gt = np.asarray(Image.open(info["depth_map_path"]), np.float32) / self.depth_scale
        if image.shape[:2] != tuple(self.image_raw_shape):
            image = (resize_hwc(image.astype(np.float32) / 255.0, self.image_raw_shape) * 255).astype(np.uint8)
        if depth_gt.shape != tuple(self.image_raw_shape):
            from patchrefinerv2_tpu.ops.resize import resize_matrix

            wh = resize_matrix(depth_gt.shape[0], self.image_raw_shape[0], "nearest", False)
            ww = resize_matrix(depth_gt.shape[1], self.image_raw_shape[1], "nearest", False)
            depth_gt = (wh @ depth_gt.astype(np.float64) @ ww.T).astype(np.float32)

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

    def get_metrics(self, depth_gt, result, disp_gt_edges=None, **kwargs):
        """Edge / non-edge split metrics (scannet_dataset.py:209-241)."""
        base = compute_metrics(
            depth_gt, result, disp_gt_edges=disp_gt_edges,
            min_depth_eval=self.min_depth, max_depth_eval=self.max_depth,
            garg_crop=False, eigen_crop=False, dataset="",
        )
        if disp_gt_edges is not None and base:
            edges = np.asarray(disp_gt_edges).squeeze().astype(bool)
            m_edge = compute_metrics(
                depth_gt, result, additional_mask=edges,
                min_depth_eval=self.min_depth, max_depth_eval=self.max_depth,
                garg_crop=False, eigen_crop=False, dataset="",
            )
            m_flat = compute_metrics(
                depth_gt, result, additional_mask=~edges,
                min_depth_eval=self.min_depth, max_depth_eval=self.max_depth,
                garg_crop=False, eigen_crop=False, dataset="",
            )
            base.update({f"edge_{k}": v for k, v in (m_edge or {}).items()})
            base.update({f"flat_{k}": v for k, v in (m_flat or {}).items()})
        return base
