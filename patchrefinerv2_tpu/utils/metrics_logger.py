"""Run metrics logging (reference uses wandb, trainer.py:55-125,255-267).

Primary sink is a JSONL file under work_dir (machine-readable, no network);
wandb is used when importable and not disabled (the reference's --debug flag
semantics). Image panels are written as PNGs under work_dir/panels.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, work_dir: str, project: str = "", debug: bool = False):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self._f = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if not debug:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project or "patchrefinerv2_tpu", dir=work_dir)
            except Exception:
                self._wandb = None

    def log(self, scalars: dict[str, Any], step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_image(self, name: str, image, step: int):
        import numpy as np

        panel_dir = os.path.join(self.work_dir, "panels")
        os.makedirs(panel_dir, exist_ok=True)
        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[-1] in (1, 3):
            import cv2

            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            path = os.path.join(panel_dir, f"{name}_{step:07d}.png")
            if arr.shape[-1] == 3:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
            cv2.imwrite(path, arr)
            return path
        return None

    def log_images(
        self,
        log_dict: dict[str, Any],
        prefix: str = "Train",
        scalar_cmap: str = "turbo_r",
        min_depth: float = 1e-3,
        max_depth: float = 80,
        step: int = 0,
    ):
        """Colorized rgb | depth_gt | depth_pred panel per the reference
        trainer's wandb image logging (trainer.py:55-125): gt colorized with
        the invalid-depth mask and ``scalar_cmap``, pred full-range; the
        panel is written as one side-by-side PNG (and mirrored to wandb
        when live). HWC float arrays expected (first batch element is
        taken from NHWC inputs)."""
        import numpy as np

        from patchrefinerv2_tpu.utils.color import colorize

        def first(x):
            a = np.asarray(x, np.float32)
            return a[0] if a.ndim == 4 else a

        if "depth_pred" not in log_dict or "depth_gt" not in log_dict:
            return None
        depth_pred = first(log_dict["depth_pred"]).squeeze()
        depth_gt = first(log_dict["depth_gt"]).squeeze()
        invalid = np.logical_or(depth_gt <= min_depth, depth_gt >= max_depth)
        if invalid.all():  # all gt pixels invalid (trainer.py:72-73)
            return None
        gt_color = colorize(
            depth_gt, vmin=None, vmax=None, invalid_mask=invalid,
            cmap=scalar_cmap, vminp=0, vmaxp=100,
        )[..., :3]
        pred_color = colorize(
            depth_pred, vmin=None, vmax=None, vminp=0, vmaxp=100
        )[..., :3]
        tiles = [gt_color, pred_color]
        if "rgb" in log_dict:
            rgb = np.clip(first(log_dict["rgb"]), 0, 1)
            rgb = (rgb * 255).astype(np.uint8)
            if rgb.shape[:2] != gt_color.shape[:2]:
                import cv2

                rgb = cv2.resize(rgb, (gt_color.shape[1], gt_color.shape[0]))
            tiles.insert(0, rgb)
        panel = np.concatenate(tiles, axis=1)
        path = self.log_image(f"{prefix}_depth", panel.astype(np.float32) / 255.0, step)
        if self._wandb is not None:
            self._wandb.log({f"{prefix}/LogImageDepth": self._wandb.Image(panel)}, step=step)
        return path

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
