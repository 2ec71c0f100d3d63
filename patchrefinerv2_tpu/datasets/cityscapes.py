"""CityScapes dataset (estimator/datasets/cityscapes_dataset.py:26-519).

Disparity -> depth via per-image camera json (:149-158); noisy gt border
zeroing (:161-165, marked -1); sky filtering by precomputed sky seg
(:179-186, marked -2); optional offline pseudo-label (+uncertainty) maps
from the PL generation pipeline (:200-219, uint16/256 with log-rescaled
uncertainty); train = rotate/color/flip + random patch crop with
pre-normalized bbox (:240-280); eval zeroes sky pixels using the gtFine
color map (:168-176).
"""

from __future__ import annotations

import json
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


def _nearest_resize_hw(x: np.ndarray, size) -> np.ndarray:
    from patchrefinerv2_tpu.ops.resize import resize_matrix

    wh = resize_matrix(x.shape[0], size[0], "nearest", False)
    ww = resize_matrix(x.shape[1], size[1], "nearest", False)
    return (wh @ x.astype(np.float64) @ ww.T).astype(np.float32)


@DATASETS.register_module()
class CityScapesDataset(DepthDataset):
    def __init__(
        self,
        mode,
        split,
        transform_cfg,
        min_depth,
        max_depth,
        patch_raw_shape=(256, 512),
        data_root="./data/cityscapes",
        resize_mode="zoe",
        with_pseudo_label=False,
        pseudo_label_path=None,
        with_seg_map=False,
        filter_sky=True,
        pre_norm_bbox=True,
        with_uncert=False,
        base=np.e,
        filter_thr=-0.1,
        **kwargs,
    ):
        self.dataset_name = "cityscapes"
        self.mode = mode
        self.data_root = data_root
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.transform_cfg = dict(transform_cfg or {})
        self.network_process_size = tuple(self.transform_cfg.get("network_process_size", [384, 512]))
        self.image_raw_shape = tuple(self.transform_cfg.get("image_raw_shape", [1024, 2048]))
        self.patch_raw_shape = tuple(patch_raw_shape)
        self.with_pseudo_label = with_pseudo_label
        self.pseudo_label_path = pseudo_label_path
        self.with_seg_map = with_seg_map
        self.with_uncert = with_uncert
        self.filter_sky = filter_sky
        self.pre_norm_bbox = pre_norm_bbox
        self.base = base
        self.filter_thr = filter_thr
        self.data_infos = self._load_split(split)

    def _load_split(self, split):
        infos = []
        with open(split) as f:
            for line in f:
                if not line.strip():
                    continue
                img, depth_map = line.strip().split(" ")
                info = dict(
                    filename=img,
                    img_path=osp.join(self.data_root, img),
                    depth_map_path=osp.join(self.data_root, depth_map),
                )
                info["camera_info"] = (
                    info["img_path"].replace("leftImg8bit", "camera").replace(".png", ".json")
                )
                if self.filter_sky:
                    info["sky_seg_path"] = info["img_path"].replace("leftImg8bit", "skyArea")
                if self.with_pseudo_label:
                    pl = depth_map.replace("disparity", "leftImg8bit").replace("/", "_")
                    pl = pl.replace(".png", "_uint16.png")
                    info["pseudo_label_path"] = osp.join(self.pseudo_label_path, pl)
                    if self.with_uncert:
                        info["uncertain_path"] = info["pseudo_label_path"].replace(
                            "_uint16.png", "_uncert_uint16.png"
                        )
                        info["count_path"] = info["pseudo_label_path"].replace(
                            "_uint16.png", "_count_uint16.png"
                        )
                if self.with_seg_map:
                    info["seg_map"] = info["depth_map_path"].replace("disparity", "gtFine").replace(
                        ".png", "_color.png"
                    )
                infos.append(info)
        return sorted(infos, key=lambda x: x["img_path"])

    def __len__(self):
        return len(self.data_infos)

    def __getitem__(self, idx):
        import cv2
        from PIL import Image

        info = self.data_infos[idx]
        image = np.asarray(Image.open(info["img_path"]).convert("RGB"))
        with open(info["camera_info"]) as f:
            cam = json.load(f)
        disp = cv2.imread(info["depth_map_path"], cv2.IMREAD_UNCHANGED).astype(np.float32)
        disp[disp > 0] = (disp[disp > 0] - 1) / 256.0
        with np.errstate(divide="ignore", invalid="ignore"):
            depth_gt = (cam["extrinsic"]["baseline"] * cam["intrinsic"]["fx"]) / disp
        depth_gt = np.nan_to_num(depth_gt, posinf=0.0, neginf=0.0, nan=0.0).astype(np.float32)
        h, w = depth_gt.shape

        # noisy border + ego-vehicle filtering (cityscapes_dataset.py:161-165)
        depth_gt[-h // 4 :, :] = -1.0
        depth_gt[:, : w // 16] = -1.0
        depth_gt[:, -w // 16 :] = -1.0

        if self.with_seg_map and self.mode == "infer":
            seg = np.asarray(Image.open(info["seg_map"]).convert("RGB"))
            sky = np.logical_and(seg[:, :, 0] == 70, seg[:, :, 1] == 130)
            depth_gt[sky] = 0.0

        if self.mode == "train" and self.filter_sky and osp.exists(info.get("sky_seg_path", "")):
            sky = np.asarray(Image.open(info["sky_seg_path"]), dtype=np.float32)
            if sky.shape != depth_gt.shape:
                sky = _nearest_resize_hw(sky, depth_gt.shape)
            depth_gt[sky > 0] = -2.0

        pseudo_depth = pseudo_uncert = None
        if self.mode == "train" and self.with_pseudo_label:
            pseudo_depth = np.asarray(Image.open(info["pseudo_label_path"]), np.float32) / 256.0
            if pseudo_depth.shape != depth_gt.shape:
                pseudo_depth = _nearest_resize_hw(pseudo_depth, depth_gt.shape)
            if self.with_uncert:
                un = np.asarray(Image.open(info["uncertain_path"]), np.float32) / 256.0
                ct = np.asarray(Image.open(info["count_path"]), np.float32) / 256.0
                un[ct < (16 + 9 + 9 + 9 + 128) * self.filter_thr] = 1.0
                if un.shape != depth_gt.shape:
                    un = _nearest_resize_hw(un, depth_gt.shape)
                un = np.log(1 + un) / np.log(self.base)
                span = un.max() - un.min()
                pseudo_uncert = (un - un.min()) / span if span > 0 else un * 0.0

        if self.mode == "train":
            image, (depth_gt, pseudo_depth, pseudo_uncert) = aug_rotate(
                image, [depth_gt, pseudo_depth, pseudo_uncert],
                self.transform_cfg.get("degree", 1.0),
            )

        image = image.astype(np.float32) / 255.0
        disp_for_edges = depth_gt.copy()

        if self.mode == "train":
            image = aug_color(image)
            image, (depth_gt, pseudo_depth, pseudo_uncert) = aug_flip(
                image, [depth_gt, pseudo_depth, pseudo_uncert]
            )

        image_lr = resize_hwc(image, self.network_process_size)
        name = osp.splitext(info["filename"])[0].replace("/", "_")

        if self.mode == "train":
            ph, pw = self.patch_raw_shape
            crop_img, (crop_depth, crop_pl, crop_un), (hs, ws) = random_crop(
                image, [depth_gt, pseudo_depth, pseudo_uncert], self.patch_raw_shape
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
            if crop_un is not None:
                out["pseudo_uncert"] = crop_un[..., None]
            return out

        boundary = get_boundaries(disp_for_edges, th=1, dilation=0)
        return {
            "image_lr": image_lr,
            "image_hr": image,
            "depth_gt": depth_gt[..., None],
            "boundary": boundary.astype(np.float32),
            "img_file_basename": name,
        }

    def get_metrics(self, depth_gt, result, disp_gt_edges=None, seg_image=None, **kwargs):
        """Base metrics + seg-edge boundary quality when a gtFine color map
        is available (cityscapes_dataset.py:318-444)."""
        from patchrefinerv2_tpu.evaluation.metrics import (
            compute_boundary_metrics,
            compute_metrics,
            extract_edges,
        )

        base = compute_metrics(
            depth_gt, result, disp_gt_edges=disp_gt_edges,
            min_depth_eval=self.min_depth, max_depth_eval=self.max_depth,
            garg_crop=False, eigen_crop=False, dataset=self.dataset_name,
        )
        if seg_image is not None and base:
            seg = np.asarray(seg_image).squeeze()
            if seg.ndim == 3:
                lab = (
                    seg[..., 0].astype(np.int64) * 65536
                    + seg[..., 1].astype(np.int64) * 256
                    + seg[..., 2].astype(np.int64)
                )
            else:
                lab = seg.astype(np.int64)
            gt_edges = np.zeros(lab.shape, bool)
            gt_edges[1:, :] |= lab[1:, :] != lab[:-1, :]
            gt_edges[:, 1:] |= lab[:, 1:] != lab[:, :-1]
            gt = np.asarray(depth_gt, np.float64).squeeze()
            valid = np.logical_and(gt > self.min_depth, gt < self.max_depth)
            pred = np.asarray(result, np.float64).squeeze()
            if pred.shape != gt.shape:
                from patchrefinerv2_tpu.datasets.transforms import resize_hwc

                pred = resize_hwc(pred[..., None].astype(np.float32), gt.shape)[..., 0]
            pred_edges = extract_edges(pred, use_canny=True, preprocess="log")
            base.update(
                compute_boundary_metrics(gt, pred, gt_edges, valid, pred_edges)
            )
        return base
