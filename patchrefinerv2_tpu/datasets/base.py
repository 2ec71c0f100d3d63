"""Dataset base + a threaded numpy batch loader (the reference uses torch
DataLoader + DistributedSampler; here the loader shards by jax process
index and emits NHWC numpy dicts ready for device_put)."""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Iterator

import numpy as np

from patchrefinerv2_tpu.evaluation.metrics import compute_metrics


class DepthDataset:
    """Common metric/evaluate surface (u4k_dataset.py:232-306 pattern)."""

    min_depth: float = 1e-3
    max_depth: float = 80.0
    garg_crop: bool = False
    eigen_crop: bool = False
    dataset_name: str = ""

    def get_metrics(self, depth_gt, result, disp_gt_edges=None, **kwargs):
        return compute_metrics(
            depth_gt,
            result,
            disp_gt_edges=disp_gt_edges,
            min_depth_eval=self.min_depth,
            max_depth_eval=self.max_depth,
            garg_crop=self.garg_crop,
            eigen_crop=self.eigen_crop,
            dataset=self.dataset_name,
        )

    def evaluate(self, results: list[dict], **kwargs) -> dict:
        from patchrefinerv2_tpu.utils.logging import print_log

        keys = list(results[0].keys())
        agg = {k: float(np.nanmean([r[k] for r in results if k in r])) for k in keys}
        header = " | ".join(f"{k:>8}" for k in agg)
        values = " | ".join(f"{v:8.4f}" for v in agg.values())
        print_log("Evaluation Summary:\n" + header + "\n" + values)
        return agg

    def evaluate_consistency(self, results: list[dict], **kwargs) -> dict:
        """nanmean aggregation of per-image consistency errors
        (u4k_dataset.py:308-341 pre_eval_to_metrics_consistency +
        evaluate_consistency)."""
        from patchrefinerv2_tpu.utils.logging import print_log

        err = float(np.nanmean([r["consistency_error"] for r in results]))
        print_log(f"Consistency Summary:\nconsistency_error\n{err:.6f}")
        return {"consistency_error": err}


def default_collate(samples: list[dict]) -> dict:
    out: dict[str, Any] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Shuffled, process-sharded, optionally prefetched batch iterator."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        num_prefetch: int = 2,
        num_workers: int = 1,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_prefetch = num_prefetch
        # >1 loads batches through a thread pool (numpy/cv2/file IO release
        # the GIL, so host aug pipelines scale near-linearly); 1 keeps the
        # single prefetch thread and with it the exact global-RNG aug order
        self.num_workers = max(1, int(num_workers))
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> list[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        # shard across processes (DistributedSampler equivalent)
        idx = idx[self.process_index :: self.process_count]
        if self.drop_last:
            n = (len(idx) // self.batch_size) * self.batch_size
            idx = idx[:n]
        return idx

    def __len__(self) -> int:
        idx = len(range(0, len(self.dataset), 1)[self.process_index :: self.process_count])
        if self.drop_last:
            return idx // self.batch_size
        return (idx + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.num_prefetch <= 0:
            for b in batches:
                yield default_collate([self.dataset[i] for i in b])
            return

        if self.num_workers > 1:
            # pooled loading with in-order yield: up to num_prefetch + 1
            # batches materialize concurrently
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            load = lambda b: default_collate([self.dataset[i] for i in b])
            ex = ThreadPoolExecutor(max_workers=self.num_workers)
            pending: deque = deque()
            it = iter(batches)
            try:
                for b in it:
                    pending.append(ex.submit(load, b))
                    if len(pending) > self.num_prefetch:
                        break
                while pending:
                    fut = pending.popleft()
                    nb = next(it, None)
                    if nb is not None:
                        pending.append(ex.submit(load, nb))
                    yield fut.result()
            finally:
                ex.shutdown(wait=False, cancel_futures=True)
            return

        q: queue.Queue = queue.Queue(maxsize=self.num_prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(default_collate([self.dataset[i] for i in b]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
