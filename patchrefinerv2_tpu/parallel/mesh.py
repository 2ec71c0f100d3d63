"""Device mesh + sharding helpers (TPU-native replacement for the
reference's NCCL/DDP layer, estimator/utils/dist.py:6-43).

The reference's only parallelism is data parallel (SURVEY.md section 2.4).
Here that is a 1-D ``Mesh(('data',))`` over all chips: the train step is
jitted with the batch sharded on 'data' and parameters replicated; XLA
inserts the gradient all-reduce over ICI. Metric gathering uses
``process_allgather`` on multihost (collect_results_gpu equivalent,
trainer.py:195-198).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with leading batch axis onto the mesh.
    Non-numeric entries (filenames etc.) are dropped — the reference's
    collect_input_args filter (trainer.py:128-134). Batches not divisible
    by the mesh size are padded by repeating samples from the start —
    the same evening-out rule torch's DistributedSampler applies
    (reference L0, SURVEY section 2.4). Only the 'data' axis shards the
    batch (a 2-D data x model mesh pads to the data size, not the full
    device count — padding further would duplicate samples in the
    gradient)."""
    sh = batch_sharding(mesh)
    n_dev = mesh.shape.get("data", mesh.devices.size)
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.dtype.kind not in ("f", "i", "u", "b"):
            continue
        b = arr.shape[0]
        if b % n_dev:
            reps = -(-b // n_dev) * n_dev - b
            idx = np.arange(b + reps) % b
            arr = arr[idx]
        out[k] = jax.device_put(jnp.asarray(arr), sh)
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def allgather_metrics(metrics: list[dict]) -> list[dict]:
    """Cross-process metric gather; identity on single-process runs."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(metrics)
    return gathered
