"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

The mesh-sharded tiled inference (models/patchrefinerplus.py) splits each
patch chunk across the 'data' axis, which linearizes ~95% of an r32 frame
across chips; the replicated whole-image coarse forward (BEiT-L / DINOv2)
is the residual serial term. This module shards that trunk Megatron-style
over a second 'model' axis so the residual also scales:

* attention qkv / MLP fc1 kernels: column-split  P(None, 'model')
* attention proj / MLP fc2 kernels: row-split    P('model', None)
* everything else (biases, LNs, convs, tables):  replicated

Expressed purely as parameter placements — the program itself is an
ordinary ``jax.jit``; GSPMD propagates the shardings through the einsums
and inserts the per-block all-reduces over ICI (the XLA-native analogue
of Megatron's column/row parallel pairs; scaling-book recipe: annotate,
let XLA place collectives). No reference counterpart: the reference's
only parallelism is DDP data parallel (SURVEY.md section 2.4).

Correctness does not require the head count to divide the model axis —
GSPMD reshards where a propagation boundary needs it — but even splits of
qkv's packed (3*H*dh) axis keep the collectives to the canonical two per
block. Divisibility of the sharded dim itself IS required and is checked
leaf-by-leaf (non-divisible leaves stay replicated).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, partition spec) — matched against the tail of each
# parameter path. Covers the DINOv2 ViT trunk (blocks_i/attn/qkv,
# attn/proj, mlp/fc1, mlp/fc2 — models/backbones/vit.py) and the BEiT-L
# trunk (blockI/attn/qkv, attn/proj, blockI/fc1, fc2 —
# models/backbones/beit.py).
TP_RULES = [
    (("attn", "qkv", "kernel"), P(None, "model")),
    (("attn", "proj", "kernel"), P("model", None)),
    (("fc1", "kernel"), P(None, "model")),
    (("fc2", "kernel"), P("model", None)),
]


def tp_mesh(n_model: int, devices=None) -> Mesh:
    """2-D Mesh(('data','model')): 'model' innermost so TP collectives ride
    adjacent-chip ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by model={n_model}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, ("data", "model"))


def _spec_for(path: tuple, shape: tuple, n_model: int):
    for suffix, spec in TP_RULES:
        if path[-len(suffix):] == suffix:
            ax = list(spec).index("model")
            if len(shape) > ax and shape[ax] % n_model == 0:
                return spec
            return P()
    return P()


def shard_tp(variables, mesh: Mesh, within: str = ""):
    """Place a variables pytree on a ('data','model') mesh: TP_RULES leaves
    sharded over 'model', the rest replicated. ``within`` restricts rule
    matching to paths containing that component (e.g. 'coarse_branch') so
    only the intended trunk is sharded; '' applies the rules everywhere."""
    n_model = mesh.shape["model"]

    def place(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = P()
        if not within or within in keys:
            spec = _spec_for(keys, getattr(leaf, "shape", ()), n_model)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)
