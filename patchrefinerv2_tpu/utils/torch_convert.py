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


def _bn(g, base, params_path, stats_path, params, stats):
    _set(params, params_path + ["scale"], g(base + ".weight"))
    _set(params, params_path + ["bias"], g(base + ".bias"))
    _set(stats, stats_path + ["mean"], g(base + ".running_mean"))
    _set(stats, stats_path + ["var"], g(base + ".running_var"))


def patch_stem_to_4ch(kernel: np.ndarray) -> np.ndarray:
    """Zero-extend a (kh, kw, 3, O) stem kernel to 4 input channels — the
    coarse-condition stem patch (patchrefinerplus.py:144-200 zero-fills the
    4th channel of the pretrained stem weight)."""
    kh, kw, ci, o = kernel.shape
    assert ci == 3, kernel.shape
    out = np.zeros((kh, kw, 4, o), kernel.dtype)
    out[:, :, :3] = kernel
    return out


def convert_timm_mbnet(
    sd: Dict[str, np.ndarray], prefix: str = "", in_ch: int = 3
) -> dict:
    """timm efficientnet/mobilenetv3-family state dict -> the
    EfficientNetB5Features / MobileNetV3LargeFeatures flax trees
    (models/backbones/encoders.py). Covers the reference's
    ``tf_efficientnet_b5_ap`` and ``mobilenetv3_large_100``
    (lightweight_refiner.py:260-262).

    timm block types are detected per block from key presence:

    * InvertedResidual (conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3) maps
      1:1 onto MBConv's names;
    * DepthwiseSeparableConv (conv_dw/bn1, se, conv_pw/bn2) maps onto the
      expand-skipped MBConv (our conv_dw/bn2, conv_pwl/bn3);
    * ConvBnAct (conv/bn1 — mobilenetv3's final 960-ch stage) maps onto
      conv_head/bn_head.

    Returns {"params": ..., "batch_stats": ...} subtrees for the encoder
    module. ``in_ch=4`` zero-extends the stem for coarse conditioning.
    NOTE (zero-egress build): validated structurally against synthetic
    state dicts with timm's key conventions; numeric validation against a
    real timm checkpoint is pending weight availability.
    """
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem = t2f_conv(g("conv_stem.weight"))
    if in_ch == 4:
        stem = patch_stem_to_4ch(stem)
    _set(params, ["conv_stem", "kernel"], stem)
    _bn(g, "bn1", ["bn_stem", "BatchNorm_0"], ["bn_stem", "BatchNorm_0"], params, stats)

    si = 0
    while has(f"blocks.{si}.0.conv_dw.weight") or has(f"blocks.{si}.0.conv.weight"):
        bi = 0
        while True:
            b = f"blocks.{si}.{bi}"
            name = f"blocks_{si}_{bi}"
            if has(b + ".conv_pwl.weight"):  # InvertedResidual
                _set(params, [name, "conv_pw", "kernel"], t2f_conv(g(b + ".conv_pw.weight")))
                _bn(g, b + ".bn1", [name, "bn1", "BatchNorm_0"], [name, "bn1", "BatchNorm_0"], params, stats)
                _set(params, [name, "conv_dw", "kernel"], t2f_conv(g(b + ".conv_dw.weight")))
                _bn(g, b + ".bn2", [name, "bn2", "BatchNorm_0"], [name, "bn2", "BatchNorm_0"], params, stats)
                _set(params, [name, "conv_pwl", "kernel"], t2f_conv(g(b + ".conv_pwl.weight")))
                _bn(g, b + ".bn3", [name, "bn3", "BatchNorm_0"], [name, "bn3", "BatchNorm_0"], params, stats)
            elif has(b + ".conv_dw.weight"):  # DepthwiseSeparableConv
                _set(params, [name, "conv_dw", "kernel"], t2f_conv(g(b + ".conv_dw.weight")))
                _bn(g, b + ".bn1", [name, "bn2", "BatchNorm_0"], [name, "bn2", "BatchNorm_0"], params, stats)
                _set(params, [name, "conv_pwl", "kernel"], t2f_conv(g(b + ".conv_pw.weight")))
                _bn(g, b + ".bn2", [name, "bn3", "BatchNorm_0"], [name, "bn3", "BatchNorm_0"], params, stats)
            elif has(b + ".conv.weight"):  # ConvBnAct -> head conv
                _set(params, ["conv_head", "kernel"], t2f_conv(g(b + ".conv.weight")))
                _bn(g, b + ".bn1", ["bn_head", "BatchNorm_0"], ["bn_head", "BatchNorm_0"], params, stats)
            else:
                break
            if has(b + ".se.conv_reduce.weight"):
                _set(params, [name, "se", "reduce", "kernel"], t2f_conv(g(b + ".se.conv_reduce.weight")))
                _set(params, [name, "se", "reduce", "bias"], g(b + ".se.conv_reduce.bias"))
                _set(params, [name, "se", "expand", "kernel"], t2f_conv(g(b + ".se.conv_expand.weight")))
                _set(params, [name, "se", "expand", "bias"], g(b + ".se.conv_expand.bias"))
            bi += 1
            if not (has(f"blocks.{si}.{bi}.conv_dw.weight") or has(f"blocks.{si}.{bi}.conv.weight")):
                break
        si += 1

    return {"params": params, "batch_stats": stats}


def convert_timm_mnv4(
    sd: Dict[str, np.ndarray], prefix: str = "", in_ch: int = 3,
    return_spec: bool = False,
) -> dict:
    """timm mobilenetv4_conv_* state dict -> MobileNetV4Features flax tree
    (models/backbones/mobilenetv4.py). Covers the reference's
    ``mobilenetv4_conv_small/medium/large`` refiner encoders
    (lightweight_refiner.py:260-262, v2_mobile_u4k.py:94).

    timm block types are detected per block from key presence:

    * UniversalInvertedResidual (``pw_exp.conv`` present) — dw_start /
      pw_exp / dw_mid / pw_proj ConvNormAct children map onto UIB's
      dw_start+bn_s / pw_exp+bn_e / dw_mid+bn_m / pw_proj+bn_p;
    * EdgeResidual (``conv_exp`` present) — conv_exp/bn1 + conv_pwl/bn2
      map 1:1;
    * ConvBnAct (``conv`` present) — conv/bn1 maps onto ConvBN; a
      single-block 1x1 stage is the 960-ch conv head.

    The architecture spec (kernels, channels, expansion, dw kernels) is
    DERIVED from weight shapes; strides from stage position (each stage's
    first block strides 2, except 1x1 convs). ``return_spec=True``
    additionally returns the derived ``_MNV4_SPECS``-format dict to build
    a structurally matching MobileNetV4Features regardless of the
    built-in variant layouts (zero-egress hedge — see mobilenetv4.py
    module docstring). ``in_ch=4`` zero-extends the stem for coarse
    conditioning; estimator checkpoints whose stem is already 4-ch pass
    ``in_ch=3`` (no patch).
    """
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if any(k.startswith(prefix) and ".layer_scale." in k for k in sd):
        raise NotImplementedError(
            "mnv4 checkpoint carries layer_scale gammas; UIB has no "
            "layer-scale path (conv variants are expected to have none)"
        )

    stem = t2f_conv(g("conv_stem.weight"))
    stem_ch = int(stem.shape[-1])
    if in_ch == 4:
        stem = patch_stem_to_4ch(stem)
    _set(params, ["conv_stem", "conv", "kernel"], stem)
    _bn(g, "bn1", ["conv_stem", "bn", "BatchNorm_0"],
        ["conv_stem", "bn", "BatchNorm_0"], params, stats)

    def _uib(b, name, bi):
        pw_exp = g(b + ".pw_exp.conv.weight")
        in_c, mid = int(pw_exp.shape[1]), int(pw_exp.shape[0])
        out_c = int(g(b + ".pw_proj.conv.weight").shape[0])
        dws = dwm = 0
        if has(b + ".dw_start.conv.weight"):
            w = g(b + ".dw_start.conv.weight")
            dws = int(w.shape[-1])
            _set(params, [name, "dw_start", "kernel"], t2f_conv(w))
            _bn(g, b + ".dw_start.bn", [name, "bn_s", "BatchNorm_0"],
                [name, "bn_s", "BatchNorm_0"], params, stats)
        _set(params, [name, "pw_exp", "kernel"], t2f_conv(pw_exp))
        _bn(g, b + ".pw_exp.bn", [name, "bn_e", "BatchNorm_0"],
            [name, "bn_e", "BatchNorm_0"], params, stats)
        if has(b + ".dw_mid.conv.weight"):
            w = g(b + ".dw_mid.conv.weight")
            dwm = int(w.shape[-1])
            _set(params, [name, "dw_mid", "kernel"], t2f_conv(w))
            _bn(g, b + ".dw_mid.bn", [name, "bn_m", "BatchNorm_0"],
                [name, "bn_m", "BatchNorm_0"], params, stats)
        _set(params, [name, "pw_proj", "kernel"],
             t2f_conv(g(b + ".pw_proj.conv.weight")))
        _bn(g, b + ".pw_proj.bn", [name, "bn_p", "BatchNorm_0"],
            [name, "bn_p", "BatchNorm_0"], params, stats)
        stride = 2 if bi == 0 else 1
        return ("uib", out_c, stride, 0, mid / in_c, dws, dwm, 1)

    def _er(b, name, bi):
        w = g(b + ".conv_exp.weight")
        mid, in_c, k = int(w.shape[0]), int(w.shape[1]), int(w.shape[-1])
        out_c = int(g(b + ".conv_pwl.weight").shape[0])
        _set(params, [name, "conv_exp", "kernel"], t2f_conv(w))
        _bn(g, b + ".bn1", [name, "bn1", "BatchNorm_0"],
            [name, "bn1", "BatchNorm_0"], params, stats)
        _set(params, [name, "conv_pwl", "kernel"], t2f_conv(g(b + ".conv_pwl.weight")))
        _bn(g, b + ".bn2", [name, "bn2", "BatchNorm_0"],
            [name, "bn2", "BatchNorm_0"], params, stats)
        stride = 2 if bi == 0 else 1
        return ("er", out_c, stride, k, mid / in_c, 0, 0, 1)

    spec_stages: list[list[tuple]] = []
    head_ch = None
    si = 0
    while any(
        has(f"blocks.{si}.0.{k}")
        for k in ("conv.weight", "conv_exp.weight", "pw_exp.conv.weight")
    ):
        rows: list[tuple] = []
        fsi = len(spec_stages)
        bi = 0
        while True:
            b = f"blocks.{si}.{bi}"
            name = f"b{fsi}_{bi}"
            if has(b + ".pw_exp.conv.weight"):
                rows.append(_uib(b, name, bi))
            elif has(b + ".conv_exp.weight"):
                rows.append(_er(b, name, bi))
            elif has(b + ".conv.weight"):
                w = g(b + ".conv.weight")
                k, out_c = int(w.shape[-1]), int(w.shape[0])
                if k == 1 and bi == 0 and not any(
                    has(f"blocks.{si}.1.{kk}")
                    for kk in ("conv.weight", "conv_exp.weight", "pw_exp.conv.weight")
                ):
                    # single-block 1x1 stage = the conv head
                    _set(params, ["conv_head", "conv", "kernel"], t2f_conv(w))
                    _bn(g, b + ".bn1", ["conv_head", "bn", "BatchNorm_0"],
                        ["conv_head", "bn", "BatchNorm_0"], params, stats)
                    head_ch = out_c
                    break
                stride = 2 if (bi == 0 and k != 1) else 1
                _set(params, [name, "conv", "kernel"], t2f_conv(w))
                _bn(g, b + ".bn1", [name, "bn", "BatchNorm_0"],
                    [name, "bn", "BatchNorm_0"], params, stats)
                rows.append(("cn", out_c, stride, k, 0, 0, 0, 1))
            else:
                break
            bi += 1
        if rows:
            spec_stages.append(rows)
        si += 1

    out = {"params": params, "batch_stats": stats}
    if return_spec:
        spec = dict(stem=stem_ch, stages=spec_stages, head=head_ch)
        return out, spec
    return out


def convert_timm_convnext(
    sd: Dict[str, np.ndarray], prefix: str = "", in_ch: int = 3, v2: bool = True
) -> dict:
    """timm convnext(v2)_large state dict -> backbones/convnext.
    ConvNeXtFeatures params (stem conv+LN, 4 stages of downsample + blocks
    with dwconv7x7 / LN / mlp / (GRN | layer-scale gamma)).

    Same zero-egress caveat as :func:`convert_timm_mbnet`.
    """
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}

    stem = t2f_conv(g("stem.0.weight"))
    if in_ch == 4:
        stem = patch_stem_to_4ch(stem)
    _set(params, ["stem_0", "kernel"], stem)
    _set(params, ["stem_0", "bias"], g("stem.0.bias"))
    _set(params, ["stem_1", "scale"], g("stem.1.weight"))
    _set(params, ["stem_1", "bias"], g("stem.1.bias"))

    for s in range(4):
        if s > 0:
            _set(params, [f"downsample_norm{s}", "scale"], g(f"stages.{s}.downsample.0.weight"))
            _set(params, [f"downsample_norm{s}", "bias"], g(f"stages.{s}.downsample.0.bias"))
            _set(params, [f"downsample_conv{s}", "kernel"], t2f_conv(g(f"stages.{s}.downsample.1.weight")))
            _set(params, [f"downsample_conv{s}", "bias"], g(f"stages.{s}.downsample.1.bias"))
        bi = 0
        while has(f"stages.{s}.blocks.{bi}.conv_dw.weight"):
            b = f"stages.{s}.blocks.{bi}"
            name = f"stage{s}_block{bi}"
            _set(params, [name, "dwconv", "kernel"], t2f_conv(g(b + ".conv_dw.weight")))
            _set(params, [name, "dwconv", "bias"], g(b + ".conv_dw.bias"))
            _set(params, [name, "norm", "scale"], g(b + ".norm.weight"))
            _set(params, [name, "norm", "bias"], g(b + ".norm.bias"))
            _set(params, [name, "pwconv1", "kernel"], t2f_linear(g(b + ".mlp.fc1.weight")))
            _set(params, [name, "pwconv1", "bias"], g(b + ".mlp.fc1.bias"))
            _set(params, [name, "pwconv2", "kernel"], t2f_linear(g(b + ".mlp.fc2.weight")))
            _set(params, [name, "pwconv2", "bias"], g(b + ".mlp.fc2.bias"))
            if v2:
                _set(params, [name, "grn", "gamma"], g(b + ".mlp.grn.weight").reshape(-1))
                _set(params, [name, "grn", "beta"], g(b + ".mlp.grn.bias").reshape(-1))
            elif has(b + ".gamma"):
                _set(params, [name, "gamma"], g(b + ".gamma"))
            bi += 1
    return {"params": params}


def _conv_wb(g, base, dst, path, bias=True):
    _set(dst, path + ["kernel"], t2f_conv(g(base + ".weight")))
    if bias:
        _set(dst, path + ["bias"], g(base + ".bias"))


def convert_zoedepth_head(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """ZoeDepth metric-bins head keys -> backbones/zoedepth.ZoeDepthHead
    (zoedepth_v1.py attribute names: conv2, seed_bin_regressor._net.{0,2},
    seed_projector._net, projectors.{i}._net, attractors.{i}._net,
    conditional_log_binomial.mlp.{0,2})."""
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}
    if has("conv2.weight"):  # PatchFusion's re-run head has no btlnck conv
        _conv_wb(g, "conv2", params, ["conv2"])

    def seq(base, name):
        node: Dict[str, Any] = {}
        _conv_wb(g, base + "._net.0", node, ["Conv_0"])
        _conv_wb(g, base + "._net.2", node, ["Conv_1"])
        params[name] = node

    seq("seed_bin_regressor", "seed_bin_regressor")
    seq("seed_projector", "seed_projector")
    i = 0
    while has(f"projectors.{i}._net.0.weight"):
        seq(f"projectors.{i}", f"projector{i}")
        seq(f"attractors.{i}", f"attractor{i}")
        i += 1
    clb: Dict[str, Any] = {}
    _conv_wb(g, "conditional_log_binomial.mlp.0", clb, ["Conv_0"])
    _conv_wb(g, "conditional_log_binomial.mlp.2", clb, ["Conv_1"])
    params["conditional_log_binomial"] = clb
    return params


def convert_zoedepth(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Full ZoeDepth (BEiT MiDaS core + bins head) -> our ZoeDepthBEiT tree
    ({core: MidasDPTBEiT, head: ZoeDepthHead}). ``prefix`` is the nesting
    inside an estimator checkpoint (e.g. 'coarse_branch.'). Each half is
    converted only when its keys are present (partial save dicts)."""
    out: Dict[str, Any] = {}
    if any(k.startswith(prefix + "core.core.") for k in sd):
        out["core"] = convert_beit_midas(sd, prefix + "core.core.")
    if any(k.startswith(prefix + "conv2.") for k in sd):
        out["head"] = convert_zoedepth_head(sd, prefix)
    return out


def _gated_conv_unit(g, base):
    """GateresConfUnit -> GatedConvUnit (bi_directional_fusion_model.py:26-82:
    conv 3x3, fusion_conv = [conv3x3, LayerNorm, act, conv1x1])."""
    node: Dict[str, Any] = {}
    _conv_wb(g, base + ".conv", node, ["Conv_0"])
    _conv_wb(g, base + ".fusion_conv.0", node, ["Conv_1"])
    _set(node, ["LayerNorm_0", "scale"], g(base + ".fusion_conv.1.weight"))
    _set(node, ["LayerNorm_0", "bias"], g(base + ".fusion_conv.1.bias"))
    _set(node, ["Conv_2", "kernel"], t2f_conv(g(base + ".fusion_conv.3.weight")))
    return node


def _gated_fusion_block(sd, g, base, single_input=False):
    """GatedFusionBlock: GateresConfUnit1 is the skip-input unit (flax
    GatedConvUnit_0 on two-input blocks; DEAD weight on single-input blocks,
    where GateresConfUnit2 is the only instantiated unit)."""
    out: Dict[str, Any] = {}
    if single_input:
        out["GatedConvUnit_0"] = _gated_conv_unit(g, base + ".GateresConfUnit2")
    else:
        out["GatedConvUnit_0"] = _gated_conv_unit(g, base + ".GateresConfUnit1")
        out["GatedConvUnit_1"] = _gated_conv_unit(g, base + ".GateresConfUnit2")
    _conv_wb(g, base + ".out_conv", out, ["Conv_0"])
    return out


def _single_conv_cnnln(g, base):
    """SingleConvCNNLN: single_conv = [conv3x3 no-bias, LayerNorm, GELU]."""
    node: Dict[str, Any] = {}
    _set(node, ["Conv_0", "kernel"], t2f_conv(g(base + ".single_conv.0.weight")))
    _set(node, ["LayerNorm_0", "scale"], g(base + ".single_conv.1.weight"))
    _set(node, ["LayerNorm_0", "bias"], g(base + ".single_conv.1.bias"))
    return node


def convert_bidirectional_fusion(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """BiDirectionalFusion state dict (bi_directional_fusion_model.py:289-446)
    -> models/blocks/fusion.BiDirectionalFusion params. Covers the C2F
    decoder (coarse-gated/fusion variants), the fusion1/fusion2 encoders,
    the f2r_agg UpSample decoder and final_conv."""
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}

    if has("c2f.scratch.layer1_rn.weight"):
        c2f: Dict[str, Any] = {"Scratch_0": {}}
        for k in range(1, 6):
            _set(c2f, ["Scratch_0", f"layer{k}_rn", "kernel"],
                 t2f_conv(g(f"c2f.scratch.layer{k}_rn.weight")))
        for k in range(1, 6):
            c2f[f"refinenet{k}"] = _gated_fusion_block(
                sd, g, f"c2f.scratch.refinenet{k}", single_input=(k == 5)
            )
        _conv_wb(g, "c2f.scratch.output_conv1", c2f, ["output_conv1"])
        _conv_wb(g, "c2f.scratch.output_conv2.0", c2f, ["output_conv2"])
        c2f["output_conv2_fusion"] = _gated_fusion_block(
            sd, g, "c2f.scratch.output_conv2_fusion", single_input=True
        )
        _conv_wb(g, "c2f.scratch.output_conv3.0", c2f, ["output_conv3"])
        params["c2f"] = c2f

    i = 0
    while has(f"fusion_layers_1.{i}.single_conv.0.weight"):
        params[f"fusion1_{i}"] = _single_conv_cnnln(g, f"fusion_layers_1.{i}")
        params[f"fusion2_{i}"] = _single_conv_cnnln(g, f"fusion_layers_2.{i}")
        i += 1
    i = 0
    while has(f"f2r_agg.{i}.conv.double_conv.0.weight"):
        dc: Dict[str, Any] = {}
        _set(dc, ["Conv_0", "kernel"], t2f_conv(g(f"f2r_agg.{i}.conv.double_conv.0.weight")))
        _set(dc, ["Conv_1", "kernel"], t2f_conv(g(f"f2r_agg.{i}.conv.double_conv.2.weight")))
        params[f"f2r_agg_{i}"] = {"DoubleConv_0": dc}
        i += 1
    _set(params, ["final_conv", "kernel"], t2f_conv(g("final_conv.weight")))
    return params


def convert_fusion_unet(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """V1 FusionUnet (fusion_model.py:52-123: encoder_layers_1/2
    SingleConvCNNLN lists, decoder_layers UpSample list, final_conv) ->
    models/blocks/fusion.FusionUnet params."""
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}
    i = 0
    while has(f"encoder_layers_1.{i}.single_conv.0.weight"):
        params[f"enc1_{i}"] = _single_conv_cnnln(g, f"encoder_layers_1.{i}")
        params[f"enc2_{i}"] = _single_conv_cnnln(g, f"encoder_layers_2.{i}")
        i += 1
    i = 0
    while has(f"decoder_layers.{i}.conv.double_conv.0.weight"):
        dc: Dict[str, Any] = {}
        _set(dc, ["Conv_0", "kernel"], t2f_conv(g(f"decoder_layers.{i}.conv.double_conv.0.weight")))
        _set(dc, ["Conv_1", "kernel"], t2f_conv(g(f"decoder_layers.{i}.conv.double_conv.2.weight")))
        params[f"dec_{i}"] = {"DoubleConv_0": dc}
        i += 1
    _set(params, ["final_conv", "kernel"], t2f_conv(g("final_conv.weight")))
    return params


def convert_patchrefiner(sd: Dict[str, np.ndarray]) -> dict:
    """PatchRefiner V1 estimator checkpoint (patchrefiner.py: coarse and
    fine branches BOTH full ZoeDepth, FusionUnet head) -> our variables."""
    params: Dict[str, Any] = {}
    if any(k.startswith("coarse_branch.") for k in sd):
        params["coarse"] = convert_zoedepth(sd, "coarse_branch.")
    if any(k.startswith("refiner_fine_branch.core.core.") for k in sd):
        params["fine"] = {"inner": convert_zoedepth(sd, "refiner_fine_branch.")}
    if any(k.startswith("refiner_fusion_model.encoder_layers_1.") for k in sd):
        params["fusion"] = convert_fusion_unet(sd, "refiner_fusion_model.")
    return {"params": params, "batch_stats": {}}


def _dconv_wobn(g, base):
    """DoubleConvWOBN: double_conv = [conv3x3, ReLU, conv3x3, ReLU]."""
    node: Dict[str, Any] = {}
    _conv_wb(g, base + ".double_conv.0", node, ["Conv_0"])
    _conv_wb(g, base + ".double_conv.2", node, ["Conv_1"])
    return node


def _dconv_bn(g, base, params_path, params, stats):
    """DoubleConv (BN variant): [conv, BN, ReLU, conv, BN, ReLU]."""
    node: Dict[str, Any] = {}
    snode: Dict[str, Any] = {}
    _set(node, ["Conv_0", "kernel"], t2f_conv(g(base + ".double_conv.0.weight")))
    _set(node, ["Conv_1", "kernel"], t2f_conv(g(base + ".double_conv.3.weight")))
    for bi, flax_bn in ((1, "BatchNorm_0"), (4, "BatchNorm_1")):
        _set(node, [flax_bn, "scale"], g(f"{base}.double_conv.{bi}.weight"))
        _set(node, [flax_bn, "bias"], g(f"{base}.double_conv.{bi}.bias"))
        _set(snode, [flax_bn, "mean"], g(f"{base}.double_conv.{bi}.running_mean"))
        _set(snode, [flax_bn, "var"], g(f"{base}.double_conv.{bi}.running_var"))
    _set(params, params_path, node)
    _set(stats, params_path, snode)


def _g2l_fusion(sd, g, base):
    """G2LFusion (swin_layers.py:360-431): embed_proj 1x1 + absolute pos
    embed + swin blocks (g2l_layer.blocks.{i}) + final g2l_layer_norm."""
    node: Dict[str, Any] = {}
    if (base + ".proj_x.weight") in sd:
        _conv_wb(lambda k: np.asarray(sd[k]), base + ".proj_x", node, ["proj_x"])
    # embed_proj is DEAD weight in the reference (applied only when an
    # area_prior is passed; PatchFusion never passes one,
    # patchfusion.py:279-287) — dropped like resConfUnit1
    node["absolute_pos_embed"] = np.asarray(sd[base + ".absolute_pos_embed"])
    i = 0
    while (base + f".g2l_layer.blocks.{i}.norm1.weight") in sd:
        b = base + f".g2l_layer.blocks.{i}"
        gg = lambda k: np.asarray(sd[b + k])
        blk: Dict[str, Any] = {}
        _set(blk, ["norm1", "scale"], gg(".norm1.weight"))
        _set(blk, ["norm1", "bias"], gg(".norm1.bias"))
        _set(blk, ["norm2", "scale"], gg(".norm2.weight"))
        _set(blk, ["norm2", "bias"], gg(".norm2.bias"))
        _set(blk, ["attn", "qkv", "kernel"], t2f_linear(gg(".attn.qkv.weight")))
        _set(blk, ["attn", "qkv", "bias"], gg(".attn.qkv.bias"))
        _set(blk, ["attn", "proj", "kernel"], t2f_linear(gg(".attn.proj.weight")))
        _set(blk, ["attn", "proj", "bias"], gg(".attn.proj.bias"))
        _set(blk, ["attn", "relative_position_bias_table"],
             gg(".attn.relative_position_bias_table"))
        _set(blk, ["fc1", "kernel"], t2f_linear(gg(".mlp.fc1.weight")))
        _set(blk, ["fc1", "bias"], gg(".mlp.fc1.bias"))
        _set(blk, ["fc2", "kernel"], t2f_linear(gg(".mlp.fc2.weight")))
        _set(blk, ["fc2", "bias"], gg(".mlp.fc2.bias"))
        node[f"block{i}"] = blk
        i += 1
    _set(node, ["g2l_layer_norm", "scale"], np.asarray(sd[base + ".g2l_layer_norm.weight"]))
    _set(node, ["g2l_layer_norm", "bias"], np.asarray(sd[base + ".g2l_layer_norm.bias"]))
    return node


def convert_guided_fusion(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """GuidedFusionPatchFusion (guided_fusion_model.py:101-191) -> our
    models/blocks/guided_fusion tree ({params, batch_stats})."""
    g = lambda k: np.asarray(sd[prefix + k])
    has = lambda k: (prefix + k) in sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _dconv_bn(g, "inc", ["inc"], params, stats)
    i = 0
    while has(f"down_conv_list.{i}.maxpool_conv.1.double_conv.0.weight"):
        _dconv_bn(
            g, f"down_conv_list.{i}.maxpool_conv.1",
            [f"down_list_{i}", "DoubleConvBN_0"], params, stats,
        )
        i += 1
    i = 0
    while has(f"up_conv_list.{i}.conv.double_conv.0.weight"):
        params[f"up_list_{i}"] = _dconv_wobn(g, f"up_conv_list.{i}.conv")
        i += 1
    i = 0
    while has(f"g2l_list.{i}.g2l_layer_norm.weight"):
        params[f"g2l_list_{i}"] = _g2l_fusion(sd, g, f"{prefix}g2l_list.{i}")
        params[f"conv_list_{i}"] = _dconv_wobn(g, f"convs.{i}")
        i += 1
    return {"params": params, "batch_stats": stats}


def convert_patchfusion(sd: Dict[str, np.ndarray]) -> dict:
    """PatchFusion estimator checkpoint (patchfusion.py:56-461: frozen
    coarse+fine ZoeDepth, 6 fusion concat convs, guided-fusion U-Net with
    G2L swin, top-level bins-head re-run) -> our variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if any(k.startswith("coarse_branch.") for k in sd):
        params["coarse"] = convert_zoedepth(sd, "coarse_branch.")
    if any(k.startswith("fine_branch.") for k in sd):
        params["fine"] = convert_zoedepth(sd, "fine_branch.")
    i = 0
    while f"fusion_conv_list.{i}.weight" in sd:
        node: Dict[str, Any] = {}
        _conv_wb(lambda k: np.asarray(sd[k]), f"fusion_conv_list.{i}", node, ["x"])
        params[f"fusion_conv{i}"] = node["x"]
        i += 1
    if any(k.startswith("guided_fusion.") for k in sd):
        gf = convert_guided_fusion(sd, "guided_fusion.")
        params["guided_fusion"] = gf["params"]
        stats["guided_fusion"] = gf["batch_stats"]
    if "seed_bin_regressor._net.0.weight" in sd:
        head = convert_zoedepth_head(
            {k: v for k, v in sd.items() if not k.startswith(("coarse_branch.", "fine_branch."))},
            prefix="",
        )
        head.pop("conv2", None)  # PF's re-run head has no btlnck conv2
        params["bins_head"] = head
    return {"params": params, "batch_stats": stats}


def convert_patchrefinerplus(sd: Dict[str, np.ndarray]) -> dict:
    """Full PatchRefinerPlus estimator checkpoint -> this framework's
    variables ({params, batch_stats}) for PRPlusNet (submodule names
    coarse/fine/fusion; patchrefinerplus.py save-dict attribute names
    coarse_branch / refiner_fine_branch / refiner_fusion_model).

    Tolerant to partial dicts (get_save_dict variants drop the frozen
    coarse): missing families are simply absent from the output; graft
    with utils.checkpoint.merge_pretrained (strict=False semantics).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if any(k.startswith("coarse_branch.pretrained.blocks.") for k in sd):
        # DA2 coarse (config coarse_branch.type == 'DA2',
        # patchrefinerplus.py:120-125): DINOv2 trunk + DPT head, not the
        # ZoeDepth bins stack
        sub = {
            k[len("coarse_branch."):]: v
            for k, v in sd.items()
            if k.startswith("coarse_branch.")
        }
        params["coarse"] = convert_da2(sub)
    elif any(k.startswith("coarse_branch.") for k in sd):
        params["coarse"] = convert_zoedepth(sd, "coarse_branch.")
    if any(k.startswith("refiner_fine_branch.refiner_encoder.") for k in sd):
        if any(
            k.startswith("refiner_fine_branch.refiner_encoder.")
            and ".pw_exp.conv." in k
            for k in sd
        ):
            enc = convert_timm_mnv4(sd, "refiner_fine_branch.refiner_encoder.")
        else:
            enc = convert_timm_mbnet(sd, "refiner_fine_branch.refiner_encoder.")
        params["fine"] = {"refiner_encoder": enc["params"]}
        stats["fine"] = {"refiner_encoder": enc["batch_stats"]}
    if any(k.startswith("refiner_fusion_model.") for k in sd):
        params["fusion"] = convert_bidirectional_fusion(sd, "refiner_fusion_model.")
    return {"params": params, "batch_stats": stats}


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
