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

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
