"""Orbax checkpointing (TPU-native replacement for torch.save dicts,
trainer.py:276-294; multi-source strict=False loading is handled by the
partial-restore helper)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


_pending: ocp.StandardCheckpointer | None = None


def save_checkpoint(path: str, tree: dict, block: bool = True):
    """With ``block=False`` the device-to-host copy still happens here
    (np.asarray — so the training step may donate/overwrite the live
    buffers immediately), but the disk write runs in orbax's background
    thread: the training loop resumes after the copy instead of stalling
    on IO. A new save (or :func:`wait_for_checkpoints`) joins the
    previous write first."""
    global _pending
    wait_for_checkpoints()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, _strip_none(tree))
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    else:
        _pending = ckptr


def wait_for_checkpoints():
    """Join the in-flight async checkpoint write, if any."""
    global _pending
    if _pending is not None:
        _pending.wait_until_finished()
        _pending = None


def load_checkpoint(path: str) -> dict:
    wait_for_checkpoints()  # a restore may race an in-flight write
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


def _load_any(path: str) -> dict:
    """Load an orbax checkpoint dir OR a torch .pth/.pt via the converter."""
    if path.endswith((".pth", ".pt")):
        from patchrefinerv2_tpu.utils.torch_convert import (
            convert_patchrefinerplus,
            load_torch_state_dict,
        )

        return convert_patchrefinerplus(load_torch_state_dict(path))
    return load_checkpoint(path)


def apply_config_pretrained(model, variables: dict) -> dict:
    """Honor the reference's in-config checkpoint keys
    (patchrefinerplus.py:105-205, patchrefiner.py:129-147), strict=False:

    * ``pretrain_coarse_model`` — a coarse-pretrain checkpoint
      (BaselinePretrain save: its params root IS the coarse module tree)
      grafted under params/coarse;
    * ``pretrain_fine_model`` — same, under params/fine (V1's full-depth
      fine branch);
    * ``pretrained`` — refiner(+fusion) restore from an m0s1 / earlier-run
      checkpoint (full PRPlusNet tree, merged as-is; with ``load_whole``
      false the coarse subtree is dropped first, patchrefiner.py:139-146);
    * ``whole_pretrained`` — full-model restore.

    Paths ending in .pth/.pt go through the torch converter. Missing or
    None paths are skipped silently (the reference requires the files; we
    log instead so random-init runs still work).
    """
    import os

    from patchrefinerv2_tpu.utils.logging import print_log

    # PatchRefinerSemi: recurse into student/teacher sub-models and honor
    # teacher_pretrain (patchrefiner_semi.py:85-94)
    if hasattr(model, "student"):
        params = dict(variables["params"])
        stats = dict(variables.get("batch_stats", {}))
        for who in ("student", "teacher"):
            sub_model = getattr(model, who, None)
            if sub_model is None or who not in params:
                continue
            sub_vars = {"params": params[who]}
            if stats.get(who):
                sub_vars["batch_stats"] = stats[who]
            sub_vars = apply_config_pretrained(sub_model, sub_vars)
            params[who] = sub_vars["params"]
            if "batch_stats" in sub_vars:
                stats[who] = sub_vars["batch_stats"]
        tp = getattr(model, "teacher_pretrain", None)
        if tp and os.path.exists(tp) and "teacher" in params:
            ckpt = _load_any(tp)
            params["teacher"] = merge_pretrained(
                params["teacher"], ckpt.get("params", ckpt)
            )
            print_log(f"loaded teacher_pretrain from {tp}")
        out = dict(variables, params=params)
        if stats:
            out["batch_stats"] = stats
        return out

    cfg = getattr(model, "config", None)
    if cfg is None:
        return variables
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    # coarse_branch.pretrained_resource: the reference's in-branch ZoeDepth
    # checkpoint ('local::<path>', zoedepth_v1.py:307-311 via
    # model_io.load_state_from_resource) — grafted under params/coarse.
    # Applied FIRST (the reference loads it at coarse-branch build time),
    # so pretrain_coarse_model / pretrained / whole_pretrained override it.
    cb = cfg.get("coarse_branch") or {}
    res = cb.get("pretrained_resource") if hasattr(cb, "get") else None
    if res:
        path = str(res)
        path = path[len("local::"):] if path.startswith("local::") else path
        if not os.path.exists(path):
            print_log(f"pretrained_resource={res} not found; keeping random init")
        elif "coarse" in params:
            if path.endswith((".pt", ".pth")):
                from patchrefinerv2_tpu.utils.torch_convert import (
                    convert_zoedepth,
                    load_torch_state_dict,
                )

                sd = load_torch_state_dict(path)
                prefix = "coarse_branch." if any(
                    k.startswith("coarse_branch.") for k in sd
                ) else ""
                ckpt = convert_zoedepth(sd, prefix)
            else:
                ckpt = load_checkpoint(path)
            sub_p = ckpt.get("params", ckpt)
            if "coarse" in sub_p:
                sub_p = sub_p["coarse"]
            params = dict(
                params, **{"coarse": merge_pretrained(params["coarse"], sub_p)}
            )
            print_log(f"loaded coarse pretrained_resource from {path}")


    for cfg_key, target in (
        ("pretrain_coarse_model", "coarse"),
        ("pretrain_fine_model", "fine"),
    ):
        path = cfg.get(cfg_key)
        if not path:
            continue
        if not os.path.exists(path):
            print_log(f"{cfg_key}={path} not found; keeping random init")
            continue
        ckpt = _load_any(path)
        sub_p = ckpt.get("params", ckpt)
        # BaselinePretrain saves the branch tree at the root; estimator
        # .pth conversions nest it under coarse/fine already
        if target in sub_p:
            sub_p = sub_p[target]
        if target in params:
            params = dict(params, **{target: merge_pretrained(params[target], sub_p)})
        sub_s = ckpt.get("batch_stats") or {}
        if target in sub_s:
            sub_s = sub_s[target]
        if sub_s and target in stats:
            stats = dict(stats, **{target: merge_pretrained(stats[target], sub_s)})
        print_log(f"loaded {cfg_key} from {path}")

    for cfg_key in ("pretrained", "whole_pretrained"):
        path = cfg.get(cfg_key)
        if not path:
            continue
        if not os.path.exists(path):
            print_log(f"{cfg_key}={path} not found; keeping random init")
            continue
        ckpt = _load_any(path)
        sub_p = ckpt.get("params", ckpt)
        if cfg_key == "pretrained" and not cfg.get("load_whole", True):
            sub_p = {k: v for k, v in sub_p.items() if k != "coarse"}
        params = merge_pretrained(params, sub_p)
        sub_s = ckpt.get("batch_stats") or {}
        if sub_s:
            stats = merge_pretrained(stats, sub_s) if stats else sub_s
        print_log(f"loaded {cfg_key} from {path}")

    out = dict(variables, params=params)
    if stats:
        out["batch_stats"] = stats
    return out
