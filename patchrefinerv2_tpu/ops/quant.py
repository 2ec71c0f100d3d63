"""Dynamic-int8 convolution for the C2F decoder hot path (opt-in).

The v5e MXU runs int8 at ~2x its bf16 rate (~394 TOPS vs ~197 TF/s), and
the single-chip r32 roofline at the flagship graph's FLOP count is ~2 fps
even at 100% bf16 MXU (docs/performance.md) — int8 is the only
single-chip lever past that ceiling. This module implements calibration-
free dynamic quantization for the GatedConvUnit convolutions (the
profiled FLOP sink, ~9.5 ms each per m1 frame at 192x256x256):

* weights: symmetric per-output-channel int8 (scale from the live bf16
  params at trace time — no checkpoint or calibration artifacts);
* activations: symmetric per-tensor int8 with a dynamic abs-max scale
  (one VPU reduction per conv input);
* accumulation in int32 on the MXU, dequantized by sx * sw[c].

NOT parity-preserving: per-conv relative error is ~1e-2 (int8 rounding),
far above the 1e-3 reference-parity bar — hence opt-in via
``PRV2_INT8=1`` and excluded from the default benchmark path. The
feasibility microbench (tools/microbench_int8.py) measures whether XLA
lowers int8 convs at these shapes to MXU rate before this mode is worth
enabling. No reference counterpart (the reference has no quantized
inference, estimator/tester/tester.py:325-404 benchmarks fp32/amp only).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["int8_enabled", "quant_conv_same"]


def int8_enabled(dtype) -> bool:
    """True when the dynamic-int8 conv path is switched on for this trace
    (env read at trace time, like the PRV2_FUSED_* flags). Gated to
    2-byte dtypes — i.e. the bf16 INFERENCE pipeline: training runs f32,
    and routing a train step through round/clip would silently zero the
    gradients of the quantized convs. ``PRV2_INT8_FORCE`` lifts the gate
    for tests (deliberately NOT the fused kernels' ``PRV2_FUSED_FORCE``:
    that flag left exported around an f32 training run must not flip the
    train-step convs onto the zero-gradient quant path)."""
    if os.environ.get("PRV2_INT8", "") in ("", "0", "false"):
        return False
    return jnp.dtype(dtype).itemsize == 2 or bool(os.environ.get("PRV2_INT8_FORCE"))


def _quantize_per_tensor(x):
    """Symmetric per-tensor int8: returns (x_q int8, scale f32 scalar)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def _quantize_per_out_channel(k):
    """Symmetric per-output-channel int8 for an HWIO kernel:
    returns (k_q int8, scale f32 (C_out,))."""
    amax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    k_q = jnp.clip(jnp.round(k.astype(jnp.float32) / scale), -127, 127)
    return k_q.astype(jnp.int8), scale


def quant_conv_same(x, kernel, bias):
    """SAME conv computed on the int8 MXU path, matching the f32/_conv_same
    result up to int8 rounding (~1e-2 rel). Output dtype follows x."""
    out_dtype = x.dtype
    x_q, sx = _quantize_per_tensor(x)
    k_q, sw = _quantize_per_out_channel(kernel)
    acc = jax.lax.conv_general_dilated(
        x_q, k_q, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
