"""PyTorch checkpoint -> flax/orbax weight converter.

The reference ecosystem publishes .pt/.pth checkpoints (MiDaS BEiT-L,
DINOv2, DA2 heads, timm encoders, estimator fusion heads;
patchrefinerplus.py:105-205, zoedepth_v1.py:307-311). This module maps
their state_dict conventions onto this framework's NHWC flax trees:

* conv weight (O, I, kh, kw) -> (kh, kw, I, O)
* conv-transpose weight (I, O, kh, kw) -> (kh, kw, O, I) with spatial flip
  (torch ConvTranspose2d cross-correlates the flipped kernel)
* linear weight (O, I) -> (I, O)
* BatchNorm running_mean/var -> batch_stats collection
* LayerNorm/bias/1-D params pass through

``convert_dino_vit`` / ``convert_da2_head`` implement the concrete key
maps for the DINOv2 trunk + DA2 DPT head (external/depth_anything_v2);
``insert_converted`` grafts a converted subtree into a params tree with
shape checking. Additional families (BEiT, timm encoders) extend the same
table in later rounds.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t2f_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch: (in, out, kh, kw); flax ConvTranspose kernel: (kh, kw, in, out)
    # and flax convolves (no flip) while torch cross-correlates the
    # transposed kernel -> flip spatial dims
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict[str, Any], path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_dino_vit(sd: Dict[str, np.ndarray], prefix: str = "pretrained.") -> dict:
    """DINOv2 trunk (external/depth_anything_v2/dinov2.py) -> DinoViT params."""
    params: Dict[str, Any] = {}
    g = lambda k: np.asarray(sd[prefix + k])
    params["cls_token"] = g("cls_token")
    params["pos_embed"] = g("pos_embed")
    _set(params, ["patch_embed", "kernel"], t2f_conv(g("patch_embed.proj.weight")))
    _set(params, ["patch_embed", "bias"], g("patch_embed.proj.bias"))
    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix) + r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        b = f"blocks.{i}."
        blk = {}
        _set(blk, ["norm1", "scale"], g(b + "norm1.weight"))
        _set(blk, ["norm1", "bias"], g(b + "norm1.bias"))
        _set(blk, ["attn", "qkv", "kernel"], t2f_linear(g(b + "attn.qkv.weight")))
        _set(blk, ["attn", "qkv", "bias"], g(b + "attn.qkv.bias"))
        _set(blk, ["attn", "proj", "kernel"], t2f_linear(g(b + "attn.proj.weight")))
        _set(blk, ["attn", "proj", "bias"], g(b + "attn.proj.bias"))
        _set(blk, ["ls1", "gamma"], g(b + "ls1.gamma"))
        _set(blk, ["ls2", "gamma"], g(b + "ls2.gamma"))
        _set(blk, ["norm2", "scale"], g(b + "norm2.weight"))
        _set(blk, ["norm2", "bias"], g(b + "norm2.bias"))
        _set(blk, ["mlp", "fc1", "kernel"], t2f_linear(g(b + "mlp.fc1.weight")))
        _set(blk, ["mlp", "fc1", "bias"], g(b + "mlp.fc1.bias"))
        _set(blk, ["mlp", "fc2", "kernel"], t2f_linear(g(b + "mlp.fc2.weight")))
        _set(blk, ["mlp", "fc2", "bias"], g(b + "mlp.fc2.bias"))
        params[f"block{i}"] = blk
    _set(params, ["norm", "scale"], g("norm.weight"))
    _set(params, ["norm", "bias"], g("norm.bias"))
    return params


def _ffb(sd, g, base, single_input=False):
    """FeatureFusionBlock (resConfUnit1/2 + out_conv) -> flax names.

    ``single_input``: the FIRST refinenet of a DPT decoder is called with one
    input, so the flax block instantiates only ResidualConvUnit_0 — which
    corresponds to torch ``resConfUnit2`` (resConfUnit1 exists in the torch
    checkpoint but is dead weight there; it is dropped)."""
    out = {}
    if single_input:
        unit_map = (("resConfUnit2", 0),)
    else:
        unit_map = (("resConfUnit1", 0), ("resConfUnit2", 1))
    for unit, unit_idx in unit_map:
        if f"{base}.{unit}.conv1.weight" not in sd:
            continue
        u = {}
        _set(u, ["Conv_0", "kernel"], t2f_conv(g(f"{base}.{unit}.conv1.weight")))
        _set(u, ["Conv_0", "bias"], g(f"{base}.{unit}.conv1.bias"))
        _set(u, ["Conv_1", "kernel"], t2f_conv(g(f"{base}.{unit}.conv2.weight")))
        _set(u, ["Conv_1", "bias"], g(f"{base}.{unit}.conv2.bias"))
        out[f"ResidualConvUnit_{unit_idx}"] = u
    _set(out, ["Conv_0", "kernel"], t2f_conv(g(f"{base}.out_conv.weight")))
    _set(out, ["Conv_0", "bias"], g(f"{base}.out_conv.bias"))
    return out


def convert_da2_head(sd: Dict[str, np.ndarray], prefix: str = "depth_head.") -> dict:
    """DA2 DPTHead (dpt.py:38-150) -> backbones/dpt.DPTHead params."""
    g = lambda k: np.asarray(sd[prefix + k])
    params: Dict[str, Any] = {}
    for i in range(4):
        _set(params, [f"project{i}", "kernel"], t2f_conv(g(f"projects.{i}.weight")))
        _set(params, [f"project{i}", "bias"], g(f"projects.{i}.bias"))
    _set(params, ["resize0", "kernel"], t2f_conv_transpose(g("resize_layers.0.weight")))
    _set(params, ["resize0", "bias"], g("resize_layers.0.bias"))
    _set(params, ["resize1", "kernel"], t2f_conv_transpose(g("resize_layers.1.weight")))
    _set(params, ["resize1", "bias"], g("resize_layers.1.bias"))
    _set(params, ["resize3", "kernel"], t2f_conv(g("resize_layers.3.weight")))
    _set(params, ["resize3", "bias"], g("resize_layers.3.bias"))
    for i in range(1, 5):
        _set(params, [f"layer{i}_rn", "kernel"], t2f_conv(g(f"scratch.layer{i}_rn.weight")))
    raw = lambda k: np.asarray(sd[k])
    for i in range(1, 5):
        # refinenet4 is the single-input head of the chain (dpt.py:122-125)
        params[f"refinenet{i}"] = _ffb(
            sd, raw, f"{prefix}scratch.refinenet{i}", single_input=(i == 4)
        )
    _set(params, ["output_conv1", "kernel"], t2f_conv(g("scratch.output_conv1.weight")))
    _set(params, ["output_conv1", "bias"], g("scratch.output_conv1.bias"))
    _set(params, ["output_conv2_0", "kernel"], t2f_conv(g("scratch.output_conv2.0.weight")))
    _set(params, ["output_conv2_0", "bias"], g("scratch.output_conv2.0.bias"))
    _set(params, ["output_conv2_1", "kernel"], t2f_conv(g("scratch.output_conv2.2.weight")))
    _set(params, ["output_conv2_1", "bias"], g("scratch.output_conv2.2.bias"))
    return params


def convert_da2(sd: Dict[str, np.ndarray]) -> dict:
    """Full DepthAnythingV2 checkpoint -> DepthAnythingV2 module params."""
    return {
        "pretrained": convert_dino_vit(sd, "pretrained."),
        "depth_head": convert_da2_head(sd, "depth_head."),
    }


def convert_beit_midas(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """MiDaS DPT_BEiT_L_384 state dict -> models/backbones/beit.MidasDPTBEiT.

    Key schema: timm BEiT trunk under ``{prefix}pretrained.model.`` (qkv with
    separate q_bias/v_bias, relative_position_bias_table with 3 trailing cls
    rows, gamma_1/2 layer scale) + MiDaS DPT readouts under
    ``{prefix}pretrained.act_postprocess{1..4}`` (0.project.0 readout linear,
    3 = 1x1 project conv, 4 = resize conv/conv-transpose) + decoder under
    ``{prefix}scratch.`` (layer{k}_rn, refinenet{k} resConfUnit1/2+out_conv,
    output_conv.0/.2/.4). ``relative_position_index`` buffers are derived,
    not copied. ``prefix`` handles nesting inside estimator checkpoints
    (e.g. ``coarse_branch.core.core.``, zoedepth_v1.py:296-311)."""
    g = lambda k: np.asarray(sd[prefix + k])
    params: Dict[str, Any] = {}

    # --- trunk -> params["pretrained"]
    t = "pretrained.model."
    trunk: Dict[str, Any] = {"cls_token": g(t + "cls_token")}
    _set(trunk, ["patch_embed", "kernel"], t2f_conv(g(t + "patch_embed.proj.weight")))
    _set(trunk, ["patch_embed", "bias"], g(t + "patch_embed.proj.bias"))
    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix + t) + r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        b = t + f"blocks.{i}."
        blk: Dict[str, Any] = {
            "gamma_1": g(b + "gamma_1"),
            "gamma_2": g(b + "gamma_2"),
        }
        _set(blk, ["norm1", "scale"], g(b + "norm1.weight"))
        _set(blk, ["norm1", "bias"], g(b + "norm1.bias"))
        _set(blk, ["norm2", "scale"], g(b + "norm2.weight"))
        _set(blk, ["norm2", "bias"], g(b + "norm2.bias"))
        _set(blk, ["attn", "qkv", "kernel"], t2f_linear(g(b + "attn.qkv.weight")))
        _set(blk, ["attn", "q_bias"], g(b + "attn.q_bias"))
        _set(blk, ["attn", "v_bias"], g(b + "attn.v_bias"))
        _set(blk, ["attn", "relative_position_bias_table"],
             g(b + "attn.relative_position_bias_table"))
        _set(blk, ["attn", "proj", "kernel"], t2f_linear(g(b + "attn.proj.weight")))
        _set(blk, ["attn", "proj", "bias"], g(b + "attn.proj.bias"))
        _set(blk, ["fc1", "kernel"], t2f_linear(g(b + "mlp.fc1.weight")))
        _set(blk, ["fc1", "bias"], g(b + "mlp.fc1.bias"))
        _set(blk, ["fc2", "kernel"], t2f_linear(g(b + "mlp.fc2.weight")))
        _set(blk, ["fc2", "bias"], g(b + "mlp.fc2.bias"))
        trunk[f"block{i}"] = blk
    params["pretrained"] = trunk

    # --- DPT reassemble: readout linear + 1x1 project + resize convs
    resize_name = {0: "resize0", 1: "resize1", 3: "resize3"}
    for i in range(4):
        ap = f"pretrained.act_postprocess{i + 1}."
        _set(params, [f"readout{i}", "kernel"], t2f_linear(g(ap + "0.project.0.weight")))
        _set(params, [f"readout{i}", "bias"], g(ap + "0.project.0.bias"))
        _set(params, [f"project{i}", "kernel"], t2f_conv(g(ap + "3.weight")))
        _set(params, [f"project{i}", "bias"], g(ap + "3.bias"))
        if i in (0, 1):
            _set(params, [resize_name[i], "kernel"], t2f_conv_transpose(g(ap + "4.weight")))
            _set(params, [resize_name[i], "bias"], g(ap + "4.bias"))
        elif i == 3:
            _set(params, [resize_name[i], "kernel"], t2f_conv(g(ap + "4.weight")))
            _set(params, [resize_name[i], "bias"], g(ap + "4.bias"))

    # --- scratch decoder
    for k in range(1, 5):
        _set(params, [f"layer{k}_rn", "kernel"], t2f_conv(g(f"scratch.layer{k}_rn.weight")))
        params[f"refinenet{k}"] = _ffb(
            sd, lambda kk: np.asarray(sd[kk]), f"{prefix}scratch.refinenet{k}",
            single_input=(k == 4),
        )
    _set(params, ["output_conv1", "kernel"], t2f_conv(g("scratch.output_conv.0.weight")))
    _set(params, ["output_conv1", "bias"], g("scratch.output_conv.0.bias"))
    _set(params, ["output_conv2_0", "kernel"], t2f_conv(g("scratch.output_conv.2.weight")))
    _set(params, ["output_conv2_0", "bias"], g("scratch.output_conv.2.bias"))
    _set(params, ["output_conv2_1", "kernel"], t2f_conv(g("scratch.output_conv.4.weight")))
    _set(params, ["output_conv2_1", "bias"], g("scratch.output_conv.4.bias"))
    return params


def insert_converted(params: dict, subtree: dict, path: tuple[str, ...]) -> dict:
    """Graft a converted subtree at path, verifying leaf shapes."""
    import copy

    out = copy.deepcopy(params)
    node = out
    for p in path[:-1]:
        node = node[p]
    target = node[path[-1]]

    def _check(dst, src, where=""):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted key {where + k} missing in target tree")
            if isinstance(v, dict):
                _check(dst[k], v, where + k + "/")
            elif tuple(dst[k].shape) != tuple(np.asarray(v).shape):
                raise ValueError(
                    f"shape mismatch at {where + k}: {dst[k].shape} vs {np.asarray(v).shape}"
                )

    _check(target, subtree)
    node[path[-1]] = _merge(target, subtree)
    return out


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}
