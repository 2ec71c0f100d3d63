"""Int8 convolution for the decoder/encoder conv sinks (opt-in serving mode).

The v5e MXU runs int8 at ~2x its bf16 rate (~394 TOPS vs ~197 TF/s), and
the single-chip r32 roofline at the flagship graph's FLOP count is ~2 fps
even at 100% bf16 MXU (docs/performance.md) — int8 is the only
single-chip lever past that ceiling. Two activation-scale modes share the
int8 conv core:

* **dynamic** (calibration-free): symmetric per-tensor int8 with an
  abs-max scale computed live per conv input. Measured END-TO-END SLOWER
  than bf16 on the flagship graph (m1 3.51 vs 4.04 fps, round 3): the
  abs-max is a serialized extra HBM reduction pass over every activation
  tensor that XLA cannot fuse into the producer.
* **static** (calibrated): per-site activation scales captured once by a
  calibration pass (`PRV2_INT8_CALIB=1` + ``mutable=['quant_stats']``,
  flax ``sow`` under the module's own scope path) and served back through
  a ``quant_scales`` variables collection. The quantize then fuses into
  the producer epilogue (round/clip/scale, no reduction) and the conv
  runs at the microbenched ~1.9x MXU rate. Standard post-training
  quantization; `tools/calibrate_int8.py` is the driver.
* **static + perchan** (``PRV2_INT8_PERCHAN=1``, set for BOTH calibration
  and serving): activations quantize against per-INPUT-channel calibrated
  abs-max, with those scales folded into the weight quantization
  (``_fold_act_scales``) so the runtime cost is identical to per-tensor
  static (a broadcast instead of scalar multiply in the producer
  epilogue; dequant unchanged). Tighter grid wherever channel ranges are
  uneven — the accuracy-refinement mode of VERDICT r3 #8.

Calibration also snapshots pre-quantized weights into a ``quant_kq``
collection (plain ``kq``/``sw`` during stats passes; the perchan-folded
``kqc``/``swc`` in the finalize pass once folded scales exist): serving
reads int8 kernels as variables instead of re-quantizing weights inside
the patch-chunk scan (half the weight HBM traffic, no per-step round).

Weights are symmetric per-output-channel int8 in both modes (scales from
the live params at trace time); accumulation is int32 on the MXU,
dequantized by sx * sw[c].

NOT parity-preserving module-by-module: per-conv relative error is ~1e-2
(int8 rounding). End-to-end, however, the static-int8 depth error vs the
f32 program is statistically identical to bf16's (docs/performance.md,
tools/ab_int8.py --vs-f32), so int8[static] is the DEFAULT benchmark
serving mode since round 4 (``BENCH_INT8=0`` restores pure bf16; the f32
program remains the parity-claim mode). Enabled via ``PRV2_INT8=1``. No
reference counterpart (the reference has no quantized inference,
estimator/tester/tester.py:325-404 benchmarks fp32/amp only).
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp

__all__ = [
    "int8_enabled",
    "calib_enabled",
    "perchan_enabled",
    "quant_conv_same",
    "quant_conv_same_perchan",
    "conv_dispatch",
    "scales_from_stats",
]


def int8_enabled(dtype) -> bool:
    """True when the int8 conv path is switched on for this trace
    (env read at trace time). Gated to 2-byte dtypes — i.e. the bf16
    INFERENCE pipeline: training runs f32, and routing a train step
    through round/clip would silently zero the gradients of the quantized
    convs. ``PRV2_INT8_FORCE`` lifts the gate for tests (a dedicated
    flag: a generic force flag left exported around an f32 training run
    must not flip the train-step convs onto the zero-gradient quant
    path)."""
    if os.environ.get("PRV2_INT8", "") in ("", "0", "false"):
        return False
    return jnp.dtype(dtype).itemsize == 2 or bool(os.environ.get("PRV2_INT8_FORCE"))


def calib_enabled() -> bool:
    """True when this trace is an int8 calibration pass: quant sites sow
    their activation abs-max into the ``quant_stats`` collection and run
    the EXACT conv (calibration observes the unquantized distribution)."""
    return os.environ.get("PRV2_INT8_CALIB", "") not in ("", "0", "false")


def _quantize_per_tensor(x, amax=None):
    """Symmetric per-tensor int8: returns (x_q int8, scale f32 scalar).
    With ``amax`` (a calibrated abs-max) the reduction is skipped and the
    round/clip/scale fuses into the producer epilogue."""
    if amax is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def _quantize_per_out_channel(k):
    """Symmetric per-output-channel int8 for an HWIO kernel:
    returns (k_q int8, scale f32 (C_out,))."""
    amax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    k_q = jnp.clip(jnp.round(k.astype(jnp.float32) / scale), -127, 127)
    return k_q.astype(jnp.int8), scale


def perchan_enabled() -> bool:
    """Per-input-channel activation scales for the static int8 mode
    (``PRV2_INT8_PERCHAN=1``). Must be set consistently for BOTH the
    calibration pass and serving: calibration folds the per-channel
    activation scales INTO the quantized weights (``kqc`` entries), so a
    perchan-serving trace reads a different weight grid than per-tensor.
    Zero runtime cost vs per-tensor: the activation quantize is the same
    round/clip with a broadcast (instead of scalar) multiply, and the
    dequant stays per-output-channel."""
    return os.environ.get("PRV2_INT8_PERCHAN", "") not in ("", "0", "false")


def _fold_act_scales(kernel, amax_c):
    """Fold per-input-channel activation scales into an HWIO kernel:
    ``conv(x, k) == conv(round(x / sx[c]), k * sx[c])`` exactly (given the
    quantization), so quantizing the FOLDED kernel per-output-channel
    keeps the whole dequant a per-cout multiply."""
    sx = jnp.maximum(amax_c.astype(jnp.float32), 1e-8) / 127.0
    return kernel.astype(jnp.float32) * sx[None, None, :, None], sx


def quant_conv_same(x, kernel, bias, x_amax=None, kq_sw=None,
                    strides=(1, 1), padding="SAME"):
    """SAME conv computed on the int8 MXU path, matching the f32/_conv_same
    result up to int8 rounding (~1e-2 rel). Output dtype follows x.
    ``x_amax``: calibrated activation abs-max (static mode); None =
    dynamic per-tensor scale. ``kq_sw``: pre-quantized (int8 kernel,
    per-channel scale) captured at calibration — skips the in-graph
    weight round/clip (which XLA re-runs per scan step) and halves the
    weight HBM traffic. ``strides``/``padding``: for the s2d-down form
    (ops/s2d.py conv_s2d_down: stride 2, explicit (1,1) pads)."""
    out_dtype = x.dtype
    x_q, sx = _quantize_per_tensor(x, x_amax)
    k_q, sw = kq_sw if kq_sw is not None else _quantize_per_out_channel(kernel)
    acc = jax.lax.conv_general_dilated(
        x_q, k_q, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def quant_conv_same_perchan(x, kernel, bias, x_amax_c, kqc_sw=None,
                            strides=(1, 1), padding="SAME"):
    """Per-input-channel static int8 conv: activations quantize against a
    calibrated PER-CHANNEL abs-max (``x_amax_c`` shape (cin,)), with the
    matching scales folded into the weight quantization
    (:func:`_fold_act_scales`) so the dequant is still one per-cout
    multiply. Tighter grid than per-tensor wherever channel ranges are
    uneven (post-LN/GELU decoder activations). ``kqc_sw``: the folded
    pre-quantized pair captured at calibration (``quant_kq`` entries
    ``kqc``/``swc``); None folds+quantizes in-graph."""
    out_dtype = x.dtype
    sx = jnp.maximum(x_amax_c.astype(jnp.float32), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    x_q = x_q.astype(jnp.int8)
    if kqc_sw is None:
        folded, _ = _fold_act_scales(kernel, x_amax_c)
        k_q, sw = _quantize_per_out_channel(folded)
    else:
        k_q, sw = kqc_sw
    acc = jax.lax.conv_general_dilated(
        x_q, k_q, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def s2d_quant_enabled() -> bool:
    """Quantization of the s2d-form conv sites (ops/s2d.py expanded
    kernels), DEFAULT ON since round 5 (``PRV2_INT8_S2D=0`` to ablate).
    The structural zeros quantize exactly to 0 and the per-output-channel
    scales equal the unexpanded kernel's, so the int8 grid is bit-exact
    vs quantizing the plain conv (tests/test_quant.py
    ``test_s2d_quant_conv_bit_exact_vs_plain_quant``); measured +1.4% m1
    end-to-end on its own, more with the head sites (docs/performance.md
    round-5 int8 table). Must be set consistently for calibration AND
    serving (the s2d sites only sow scales when enabled)."""
    return os.environ.get("PRV2_INT8_S2D", "1") not in ("", "0", "false")


def quant_skip(family: str) -> bool:
    """Site-family exclusion from quantization (``PRV2_INT8_SKIP``, comma
    list). Families: ``head`` (C2F output_conv2 + 32-ch gated head),
    ``oc1`` (C2F output_conv1, 256->128 full-res), ``tailfuse``
    (fusion1_0/fusion2_0 s2d SingleConvs), ``taildc`` (f2r_agg_4's
    s2d-down second conv — the layer feeding final_conv). Used to
    attribute and control the depth-error tail the round-5 coverage
    widening introduced (docs/performance.md)."""
    skip = os.environ.get("PRV2_INT8_SKIP", _DEFAULT_SKIP)
    return family in {s.strip() for s in skip.split(",") if s.strip()}


# round-5 accuracy A/B outcome (docs/performance.md): quantizing the
# full-resolution s2d TAIL — fusion1_0/fusion2_0 and the f2r_agg_4
# down-conv, the layers feeding final_conv — fattened the depth-error
# tail vs f32 11x (>1e-2 pixels 1.6% -> 18.5%) for ~+1.3% speed, while
# the C2F head/oc1 sites are accuracy-free; the tail stays excluded by
# default. Overridable per-run via PRV2_INT8_SKIP.
_DEFAULT_SKIP = "tailfuse,taildc"


def conv_dispatch(mdl, dtype, fallback, strides=(1, 1), padding="SAME",
                  prefix="qamax"):
    """Per-module quant-aware conv dispatcher.

    Returns a ``conv(x, kernel, bias)`` callable for use inside a flax
    module's ``__call__``. Call sites within the module are numbered in
    call order (``qamax_0``, ``qamax_1``, ...) under the module's own
    scope path, so calibration and serving traces of the same graph agree
    on names. Modes:

    * initialization / flags off -> ``fallback`` (the exact conv);
    * ``PRV2_INT8_CALIB=1``      -> exact conv + sow the activation
      abs-max into ``quant_stats`` AND the pre-quantized weight pair
      (int8 kernel, per-channel scale) into ``quant_kq`` (requires
      ``mutable=['quant_stats', 'quant_kq']``);
    * ``PRV2_INT8=1`` + a ``quant_scales`` entry for the site -> static-
      scale int8 (no reduction); with a ``quant_kq`` entry the in-graph
      weight round/clip is skipped entirely (the int8 kernel is served
      as a variable — half the weight HBM traffic and no re-quantization
      inside the patch-chunk ``lax.scan``);
    * ``PRV2_INT8=1`` otherwise  -> dynamic int8 (abs-max per input).

    ``quant_kq`` entries are snapshots of the params at calibration time:
    re-run ``calibrate_int8`` after any weight update.

    s2d interaction: s2d-form conv sites (ops/s2d.py expanded kernels)
    route through this dispatcher only under ``PRV2_INT8_S2D=1``
    (:func:`s2d_quant_enabled`); otherwise they run the exact conv. The
    expanded kernels' structural zeros quantize exactly to 0 and leave
    the per-output-channel abs-max unchanged, so the int8 grid matches
    the unexpanded conv's.
    """
    if mdl.is_initializing():
        return fallback
    calib = calib_enabled()
    if not calib and not int8_enabled(dtype):
        return fallback
    counter = itertools.count()
    # arithmetic-intensity gate: int8 wins only where the 2x MXU rate
    # outweighs the quantize/dequant memory passes. Per input element a
    # conv does ~2*kh*kw*cout FLOPs; v5e needs ~240 FLOP/byte to be
    # compute-bound (197 TF/s / 819 GB/s), so low-kh*kw*cout convs (1x1
    # small-C, head convs) are traffic-bound and quantizing them only
    # adds passes. Threshold tunable for A/B via PRV2_INT8_MIN_KC.
    # PRV2_INT8_MIN_HW additionally gates on the SPATIAL extent: the
    # round-5 trace diff (tools/diff_trace.py, docs/performance.md) shows
    # int8 wins ~1.7x on large-spatial convs but LOSES ~30% on the
    # small-spatial decoder stages (f2r_agg_0/1 at <= 48x64) where the
    # MXU is under-occupied either way and the quantize/dequant passes
    # dominate.
    # round-5 defaults, chosen by on-chip A/B (docs/performance.md int8
    # table): KC 1152 admits the 256->128 C2F head conv (the largest
    # then-unquantized op) — 512 pulls in net losers; HW 8192 excludes
    # the <=48x64 decoder stages, which MEASURE ~30% slower as int8.
    min_kc = int(os.environ.get("PRV2_INT8_MIN_KC", "1152"))
    min_hw = int(os.environ.get("PRV2_INT8_MIN_HW", "8192"))

    def conv(x, kernel, bias):
        # site names are per (module, prefix): a module using TWO
        # dispatchers (DoubleConv's s2d-down second conv) must pass a
        # distinct prefix or the counters collide on the same variable
        name = f"{prefix}_{next(counter)}"
        kh, kw, _, cout = kernel.shape
        hw = x.shape[1] * x.shape[2] if x.ndim == 4 else 0
        if (kh * kw * cout < min_kc or hw < min_hw) and not calib:
            return fallback(x, kernel, bias)
        cname = f"qc_{name}"
        if calib:
            xf = jnp.abs(jax.lax.stop_gradient(x).astype(jnp.float32))
            mdl.sow(
                "quant_stats", name, jnp.max(xf),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
            # per-input-channel abs-max (perchan static mode)
            cin = x.shape[-1]
            mdl.sow(
                "quant_stats", cname, jnp.max(xf, axis=tuple(range(x.ndim - 1))),
                init_fn=lambda: jnp.zeros((cin,), jnp.float32),
                reduce_fn=jnp.maximum,
            )
            k_sg = jax.lax.stop_gradient(kernel)
            k_q, sw = _quantize_per_out_channel(k_sg)
            entry = {"kq": k_q, "sw": sw}
            if mdl.has_variable("quant_scales", cname):
                # finalize pass (folded scales already injected): also
                # pre-quantize the perchan-folded kernel
                folded, _ = _fold_act_scales(
                    k_sg, mdl.get_variable("quant_scales", cname)
                )
                kqc, swc = _quantize_per_out_channel(folded)
                entry.update(kqc=kqc, swc=swc)
            mdl.sow(
                "quant_kq", name, entry,
                init_fn=lambda: 0,
                reduce_fn=lambda _old, new: new,  # weights are static
            )
            return fallback(x, kernel, bias)
        entry = (
            mdl.get_variable("quant_kq", name)
            if mdl.has_variable("quant_kq", name)
            else {}
        )
        if perchan_enabled() and mdl.has_variable("quant_scales", cname):
            kqc_sw = (
                (entry["kqc"], entry["swc"]) if "kqc" in entry else None
            )
            return quant_conv_same_perchan(
                x, kernel, bias,
                mdl.get_variable("quant_scales", cname), kqc_sw=kqc_sw,
                strides=strides, padding=padding,
            )
        x_amax = (
            mdl.get_variable("quant_scales", name)
            if mdl.has_variable("quant_scales", name)
            else None
        )
        kq_sw = (entry["kq"], entry["sw"]) if "kq" in entry else None
        return quant_conv_same(x, kernel, bias, x_amax=x_amax, kq_sw=kq_sw,
                               strides=strides, padding=padding)

    return conv


def scales_from_stats(stats_trees):
    """Fold one or more ``quant_stats`` collections (as returned by
    ``apply(..., mutable=['quant_stats'])``, one per calibration batch)
    into a ``quant_scales`` collection: elementwise max of the observed
    abs-max values, same tree structure. Inject into serving variables as
    ``{**variables, 'quant_scales': scales}``."""
    import functools

    trees = list(stats_trees)
    if not trees:
        raise ValueError("no calibration stats")
    return jax.tree_util.tree_map(
        lambda *xs: functools.reduce(jnp.maximum, xs), *trees
    )
