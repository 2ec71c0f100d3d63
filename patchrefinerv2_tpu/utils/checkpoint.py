"""Orbax checkpointing (TPU-native replacement for torch.save dicts,
trainer.py:276-294; multi-source strict=False loading is handled by the
partial-restore helper)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: dict):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, _strip_none(tree))
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str) -> dict:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def _strip_none(tree):
    if isinstance(tree, dict):
        return {k: _strip_none(v) for k, v in tree.items() if v is not None}
    return tree


def merge_pretrained(params: dict, pretrained: dict, strict: bool = False) -> dict:
    """strict=False torch.load_state_dict equivalent: copy matching leaves
    by path, keep everything else (patchrefinerplus.py:105-205)."""
    import copy

    merged = copy.deepcopy(params)

    def _merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                if strict:
                    raise KeyError(f"unexpected key {path + k}")
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                _merge(dst[k], v, path + k + "/")
            else:
                if hasattr(dst[k], "shape") and hasattr(v, "shape") and dst[k].shape != v.shape:
                    if strict:
                        raise ValueError(f"shape mismatch at {path + k}")
                    continue
                dst[k] = v

    _merge(merged, pretrained)
    return merged
