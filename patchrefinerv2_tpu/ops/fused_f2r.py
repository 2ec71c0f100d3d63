"""Fused full-resolution f2r tail for BiDirectionalFusion (Pallas TPU).

The V2 fusion head finishes with a chain of small-channel ops at FULL patch
resolution (reference estimator/models/blocks/bi_directional_fusion_model.py
:417-446 + fusion_model.py:7-35):

    h1    = gelu(LN(conv3x3(cat(c0, f0), kA)))            # fusion1_0
    h2    = gelu(LN(conv3x3(cat(h1, p1, p2), kB)))        # fusion2_0
    d1    = gelu(conv3x3(cat(x1up, h2, p1, p2), kC))      # f2r_agg_4 DoubleConv
    d2    = gelu(conv3x3(d1, kD))
    off   = conv3x3(d2, kE)                               # final_conv
    depth = max(base + off, 0)

At 16 patches x 384x512 these are HBM-bound in XLA: every concat is a
layout pass over ~0.4 GB and every 32/98-channel conv runs at a fraction
of MXU peak (xprof round 1: the cat feeding fusion1_0 alone is ~12.5
ms/frame and the decoder-tail chain ~17 ms — docs/performance.md). This
kernel executes the whole chain in VMEM per (batch, row-block, col-block)
grid step: the only HBM traffic is one haloed read of each input and one
write of the depth map.

Implementation notes:
* Convs are im2col-over-width 3-dot contractions: one lane-concatenated
  (rows, cols, 3*Cin) buffer per stage, one dot per row tap — few MXU
  instructions (the ops/fused_tail.py 27-unrolled-dot compile blowup was
  the motivating failure).
* The concats never materialize: the im2col lane order is (dx, cin) with
  cin following the reference concat order, and the conv kernels are
  reshaped to match on the host side.
* Every stage output is re-zeroed outside the true tensor before the next
  conv (the LN bias makes out-of-tensor positions nonzero, but SAME
  padding semantics require the next conv to read zeros — the
  ops/fused_tail.py lesson).
* All inputs are pre-padded on the host by the full 5-deep halo in BOTH
  spatial axes, so every window DMA is in-bounds and the kernel does no
  spatial padding of its own.
* The 2x upsample of the decoder feature stays in XLA (its dense-matmul
  form fuses with the producer conv; profiled in round 1).
* final_conv's 1-channel output is a VPU lane-reduction, and depth moves
  as (N, H, W) so the in/out blocks keep W on the lane axis.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_f2r_supported", "fused_f2r_tail"]

_HALO = 5  # chain depth: A..E = 5 stacked 3x3 convs


def _lanes(c):
    return -(-c // 128) * 128


def _vmem_need(bh, bw, c0c, f0c, tc, midc, outc, itemsize):
    """Rough peak-live VMEM of one grid step (lane dims padded to 128;
    windows double-buffered for the cross-step prefetch)."""
    win = 2 * (
        (bh + 10) * (bw + 10) * _lanes(c0c)
        + (bh + 10) * (bw + 10) * _lanes(f0c)
        + (bh + 8) * (bw + 8) * _lanes(2)
        + (bh + 6) * (bw + 6) * _lanes(midc - tc - 2)
    ) * itemsize
    stage_a = (
        (bh + 10) * (bw + 8) * _lanes(3 * (c0c + f0c)) * itemsize  # im2col
        + (bh + 8) * (bw + 8) * _lanes(tc) * 4  # f32 acc
        + (bh + 8) * (bw + 8) * _lanes(tc) * itemsize  # h1
    )
    stage_c = (
        (bh + 6) * (bw + 4) * _lanes(3 * midc) * itemsize
        + (bh + 4) * (bw + 4) * _lanes(midc) * 4
        + (bh + 4) * (bw + 4) * _lanes(midc) * itemsize
    )
    return win + max(stage_a, stage_c) + (bh + 6) * (bw + 6) * _lanes(tc) * itemsize


def _pick_blocks(h, w, c0c, f0c, tc, midc, outc, itemsize):
    budget = 11 * 1024 * 1024
    # the depth output moves as rank-3 (1, bh, bw) blocks, so bh sits on
    # the sublane axis: mosaic requires it divisible by 8 (bh=4 trips
    # "block shape ... divisible by 8" on the real chip)
    for bw in (256, 128):
        if w % bw:
            continue
        for bh in (8,):
            if h % bh:
                continue
            if _vmem_need(bh, bw, c0c, f0c, tc, midc, outc, itemsize) < budget:
                return bh, bw
    return None


def fused_f2r_supported(shape, c0_ch: int, f0_ch: int, tc: int, mid_ch: int,
                        out_ch: int, dtype=jnp.bfloat16) -> bool:
    if os.environ.get("PRV2_FUSED_F2R", "") in ("", "0", "false"):
        return False
    # inference-only: pallas_call has no VJP, and the training path runs
    # f32 (PRV2_FUSED_FORCE lifts the dtype gate for interpret-mode tests)
    if jnp.dtype(dtype).itemsize != 2 and not os.environ.get("PRV2_FUSED_FORCE"):
        return False
    n, h, w, _ = shape
    if w % 128 or w > 1024 or h % 4 or h < 32:
        return False
    if max(c0_ch, f0_ch, tc, out_ch) > 128 or mid_ch > 256:
        return False
    return _pick_blocks(h, w, c0_ch, f0_ch, tc, mid_ch, out_ch, 2) is not None


def _gelu(x):
    if x.dtype == jnp.bfloat16:
        # tanh-gelu, computed in f32: mosaic's bf16 transcendental
        # lowerings are unreliable on real TPUs (the bf16 logistic fails
        # its verifier outright — see fused_gcu), and the model's own
        # bf16 gelu upcasts to f32 on the VPU anyway, so rounding matches
        return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(
            jnp.bfloat16)
    return jax.nn.gelu(x, approximate=False)


def _conv3dot(xim, w3, rows_out):
    """xim: (rows_out + 2, cols, 3*Cin) width-im2col; w3: (3, 3*Cin, Co).
    f32 result (rows_out, cols, Co)."""
    cols = xim.shape[1]
    co = w3.shape[-1]
    acc = jnp.zeros((rows_out, cols, co), jnp.float32)
    for dy in range(3):
        acc = acc + jax.lax.dot_general(
            xim[dy : dy + rows_out],
            w3[dy],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _im2col_w(pieces, cols_out):
    """Width-axis im2col: lane-concat of the 3 dx-shifted slices of each
    piece, (dx major, piece/channel minor) to match the host-reshaped
    kernels. Pieces must share leading (rows, cols_out + 2)."""
    parts = []
    for dx in range(3):
        for p in pieces:
            parts.append(p[:, dx : dx + cols_out, :])
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def _build(n, h, w, c0c, f0c, tc, midc, outc, relu_clamp, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    blocks = _pick_blocks(h, w, c0c, f0c, tc, midc, outc, dtype.itemsize)
    _e = os.environ.get("PRV2_F2R_BLOCKS", "")
    if _e:
        bh, bw = (int(t) for t in _e.split("x"))
        if h % bh == 0 and w % bw == 0:
            blocks = (bh, bw)
    if blocks is None and interpret:
        # interpret mode has no VMEM ceiling (and no mosaic 8-alignment):
        # any shape-divisible block exercises the same numerics
        blocks = next(((bh, bw) for bw in (256, 128) for bh in (8, 4)
                       if w % bw == 0 and h % bh == 0), None)
    if blocks is None:
        raise ValueError(f"no block size fits VMEM for {(n, h, w)}")
    bh, bw = blocks
    n_hb, n_wb = h // bh, w // bw
    x1c = midc - tc - 2
    eps = 1e-6

    conv3dot = _conv3dot
    im2col_w = _im2col_w

    def ln_gelu(acc, s_ref, b_ref):
        """DotLayerNorm (f32 stats) + gelu, matching SingleConvCNNLN."""
        # round to the activation dtype first: the unfused chain's conv
        # output is dtype before LN re-upcasts it
        acc = acc.astype(dtype).astype(jnp.float32)
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (acc - mean) * jax.lax.rsqrt(var + eps)
        y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        return _gelu(y.astype(dtype))

    def kernel(c0_hbm, f0_hbm, pp_hbm, x1_hbm, base_ref,
               kA_ref, sA_ref, bA_ref, kB_ref, sB_ref, bB_ref,
               kC_ref, kD_ref, kE_ref, out_ref,
               c0_v, f0_v, pp_v, x1_v, sems):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        r0 = hi * bh
        w0 = wi * bw

        # haloed windows (inputs pre-padded by _HALO zeros in H and W),
        # double-buffered: step i waits on the copies step i-1 started and
        # prefetches step i+1's windows before computing
        lin = (ni * n_hb + hi) * n_wb + wi
        slot = jax.lax.rem(lin, 2)

        def window_dmas(b_ni, b_hi, b_wi, b_slot):
            br, bw0 = b_hi * bh, b_wi * bw
            return [
                pltpu.make_async_copy(
                    c0_hbm.at[b_ni, pl.ds(br, bh + 10), pl.ds(bw0, bw + 10)],
                    c0_v.at[b_slot], sems.at[b_slot, 0]),
                pltpu.make_async_copy(
                    f0_hbm.at[b_ni, pl.ds(br, bh + 10), pl.ds(bw0, bw + 10)],
                    f0_v.at[b_slot], sems.at[b_slot, 1]),
                pltpu.make_async_copy(
                    pp_hbm.at[b_ni, pl.ds(br + 1, bh + 8), pl.ds(bw0 + 1, bw + 8)],
                    pp_v.at[b_slot], sems.at[b_slot, 2]),
                pltpu.make_async_copy(
                    x1_hbm.at[b_ni, pl.ds(br + 2, bh + 6), pl.ds(bw0 + 2, bw + 6)],
                    x1_v.at[b_slot], sems.at[b_slot, 3]),
            ]

        @pl.when(lin == 0)
        def _():
            for cp in window_dmas(ni, hi, wi, slot):
                cp.start()

        for cp in window_dmas(ni, hi, wi, slot):
            cp.wait()

        nxt = lin + 1

        @pl.when(nxt < n * n_hb * n_wb)
        def _():
            n_ni = nxt // (n_hb * n_wb)
            rem = jax.lax.rem(nxt, n_hb * n_wb)
            for cp in window_dmas(n_ni, rem // n_wb, jax.lax.rem(rem, n_wb),
                                  jax.lax.rem(nxt, 2)):
                cp.start()

        c0_w = c0_v[slot]
        f0_w = f0_v[slot]
        pp_w = pp_v[slot]
        x1_w = x1_v[slot]

        def zero_outside(y, ext):
            """Zero positions whose tensor coords (r0 - ext + r, w0 - ext + j)
            fall outside [0, h) x [0, w)."""
            ry, rx = y.shape[0], y.shape[1]
            rg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 0) + r0 - ext
            cg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 1) + w0 - ext
            ok = (rg >= 0) & (rg < h) & (cg >= 0) & (cg < w)
            return y * ok.astype(y.dtype)

        # ---- stage A: fusion1_0 over cat(c0, f0) -> ext 4
        xim = im2col_w([c0_w, f0_w], bw + 8)
        h1 = ln_gelu(conv3dot(xim, kA_ref[...], bh + 8), sA_ref, bA_ref)
        h1 = zero_outside(h1, 4)

        # ---- stage B: fusion2_0 over cat(h1, p1, p2) -> ext 3
        xim = im2col_w([h1, pp_w], bw + 6)
        h2 = ln_gelu(conv3dot(xim, kB_ref[...], bh + 6), sB_ref, bB_ref)
        h2 = zero_outside(h2, 3)

        # ---- stage C: DoubleConv Conv_0 over cat(x1up, h2, p1, p2) -> ext 2
        ppc = pp_w[1:-1, 1:-1, :]
        xim = im2col_w([x1_w, h2, ppc], bw + 4)
        d1 = _gelu(conv3dot(xim, kC_ref[...], bh + 4).astype(dtype))
        d1 = zero_outside(d1, 2)

        # ---- stage D: DoubleConv Conv_1 -> ext 1
        xim = im2col_w([d1], bw + 2)
        d2 = _gelu(conv3dot(xim, kD_ref[...], bh + 2).astype(dtype))
        d2 = zero_outside(d2, 1)

        # ---- stage E: final_conv (1 channel) as a VPU lane-reduce
        xim = im2col_w([d2], bw)  # (bh+2, bw, 3*outc)
        kE = kE_ref[...].astype(jnp.float32)  # (3, 3*outc)
        off = jnp.zeros((bh, bw), jnp.float32)
        for dy in range(3):
            off = off + jnp.sum(
                xim[dy : dy + bh].astype(jnp.float32) * kE[dy][None, None, :],
                axis=-1,
            )
        res = base_ref[0].astype(jnp.float32) + off
        if relu_clamp:
            res = jnp.maximum(res, 0.0)
        out_ref[0] = res.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # c0, pre-padded
            pl.BlockSpec(memory_space=pl.ANY),  # f0
            pl.BlockSpec(memory_space=pl.ANY),  # pp = cat(p1, p2)
            pl.BlockSpec(memory_space=pl.ANY),  # x1up
            pl.BlockSpec((1, bh, bw), lambda ni, hi, wi: (ni, hi, wi)),  # base
            pl.BlockSpec((3, 3 * (c0c + f0c), tc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * (tc + 2), tc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * midc, midc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((3, 3 * midc, outc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((3, 3 * outc), lambda *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, bw), lambda ni, hi, wi: (ni, hi, wi)),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 10, bw + 10, c0c), dtype),
            pltpu.VMEM((2, bh + 10, bw + 10, f0c), dtype),
            pltpu.VMEM((2, bh + 8, bw + 8, 2), dtype),
            pltpu.VMEM((2, bh + 6, bw + 6, x1c), dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * (9 * (c0c + f0c) * tc + 9 * (tc + 2) * tc
                                   + 9 * midc * midc + 9 * midc * outc + 9 * outc),
            bytes_accessed=n * h * w * (c0c + f0c + x1c + 4) * dtype.itemsize,
            transcendentals=4 * n * h * w * tc,
        ),
    )


def _k3(kernel):
    """(3, 3, Cin, Cout) HWIO -> (3, 3*Cin, Cout): dy rows, (dx, cin) lane
    order matching the width-im2col concat."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    return kernel.reshape(3, 3 * cin, cout)


def fused_f2r_tail(c0, f0, pred1, pred2, x1up, base, kA, lnA, kB, lnB,
                   kC, kD, kE, relu_clamp=True, interpret=None):
    """Run the fused tail.

    c0/f0: (N,H,W,Cc)/(N,H,W,Cf) level-0 coarse/fine features; pred1/pred2:
    (N,H,W,1); x1up: (N,H,W,Cx) the 2x-upsampled decoder feature; base:
    (N,H,W,1) update base (None -> zeros, no clamp); kA..kE: HWIO conv
    kernels; lnA/lnB: (scale, bias) pairs. Returns depth (N, H, W, 1).
    """
    n, h, w, c0c = c0.shape
    f0c = f0.shape[-1]
    tc = kA.shape[-1]
    midc = x1up.shape[-1] + tc + 2
    outc = kD.shape[-1]
    dt = c0.dtype
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if base is None:
        base = jnp.zeros((n, h, w, 1), dt)
        relu_clamp = False

    pad5 = ((0, 0), (_HALO, _HALO), (_HALO, _HALO), (0, 0))
    pp = jnp.concatenate([pred1, pred2], axis=-1).astype(dt)
    call = _build(n, h, w, c0c, f0c, tc, midc, outc, bool(relu_clamp),
                  jnp.dtype(dt).name, bool(interpret))
    depth = call(
        jnp.pad(c0, pad5),
        jnp.pad(f0.astype(dt), pad5),
        jnp.pad(pp, pad5),
        jnp.pad(x1up.astype(dt), pad5),
        base[..., 0].astype(dt),
        _k3(kA).astype(dt),
        lnA[0].reshape(1, -1).astype(dt),
        lnA[1].reshape(1, -1).astype(dt),
        _k3(kB).astype(dt),
        lnB[0].reshape(1, -1).astype(dt),
        lnB[1].reshape(1, -1).astype(dt),
        _k3(kC).astype(dt),
        _k3(kD).astype(dt),
        _k3(kE).reshape(3, 3 * outc).astype(dt),
    )
    return depth[..., None]


# --------------------------------------------------------------------------
# Fused C2F out-head: the other full-resolution chain of the V2 fusion head
# (bi_directional_fusion_model.py:176-207 output_conv1 -> output_conv2 ->
# GatedFusionBlock(head2, upscale=False) -> output_conv3):
#
#     o1  = conv3x3(p1, kO1) + bO1                  # 256 -> 128
#     lf0 = relu(conv3x3(o1, kO2) + bO2)            # 128 -> 32
#     g1  = lf0 + conv3x3(relu(lf0), kG1) + bG1     # GCU residual conv
#     f   = conv3x3(cat(g1, c0), kG2) + bG2         # GCU fusion conv
#     f   = conv1x1(relu(LN(f)), kG3)
#     y   = g1 * sigmoid(f)        (gate)  else  y = f
#     lf  = conv1x1(y, kGF) + bGF                   # GatedFusionBlock out
#     out = conv1x1(lf, kO3) + bO3                  # output_conv3 (1 ch)
#
# Same machinery as the f2r tail: width-im2col 3-dot convs, haloed
# double-buffered window DMAs, out-of-tensor re-zeroing between SAME convs.
# p1 (the refinenet1 output) is the only large input — read once.
# --------------------------------------------------------------------------

_HEAD_HALO = 4  # o1, o2, gcu-conv1, gcu-conv2


def _head_vmem_need(bh, bw, cp, cm, ct, cc, itemsize):
    win = 2 * (
        (bh + 8) * (bw + 8) * _lanes(cp) + (bh + 2) * (bw + 2) * _lanes(cc)
    ) * itemsize
    stage_o1 = (
        (bh + 8) * (bw + 6) * _lanes(3 * cp) * itemsize
        + (bh + 6) * (bw + 6) * _lanes(cm) * (4 + itemsize)
    )
    stage_o2 = (
        (bh + 6) * (bw + 4) * _lanes(3 * cm) * itemsize
        + (bh + 4) * (bw + 4) * _lanes(ct) * (4 + itemsize)
    )
    return win + max(stage_o1, stage_o2) + (bh + 4) * (bw + 4) * _lanes(ct) * itemsize


def _head_pick_blocks(h, w, cp, cm, ct, cc, itemsize):
    budget = 11 * 1024 * 1024
    # outputs[1] is rank-3 (1, bh, bw): bh must divide by 8 (see
    # _pick_blocks) — prefer the narrower bw first so bh=8 fits VMEM at
    # the 256-channel refinenet1 width
    for bw in (128, 256):
        if w % bw:
            continue
        for bh in (8,):
            if h % bh:
                continue
            if _head_vmem_need(bh, bw, cp, cm, ct, cc, itemsize) < budget:
                return bh, bw
    return None


def fused_c2f_head_supported(shape, cm: int, ct: int, cc: int,
                             dtype=jnp.bfloat16) -> bool:
    if os.environ.get("PRV2_FUSED_C2F_HEAD", "") in ("", "0", "false"):
        return False
    if jnp.dtype(dtype).itemsize != 2 and not os.environ.get("PRV2_FUSED_FORCE"):
        return False
    n, h, w, cp = shape
    if w % 128 or w > 1024 or h % 4 or h < 32:
        return False
    if cp > 512 or cp % 128 or cm % 128 or ct > 128 or cc > 128:
        return False
    return _head_pick_blocks(h, w, cp, cm, ct, cc, 2) is not None


@functools.lru_cache(maxsize=None)
def _build_head(n, h, w, cp, cm, ct, cc, gate, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    blocks = _head_pick_blocks(h, w, cp, cm, ct, cc, dtype.itemsize)
    _e = os.environ.get("PRV2_C2F_BLOCKS", "")
    if _e:
        bh, bw = (int(t) for t in _e.split("x"))
        if h % bh == 0 and w % bw == 0:
            blocks = (bh, bw)
    if blocks is None:
        raise ValueError(f"no block size fits VMEM for {(n, h, w)}")
    bh, bw = blocks
    n_hb, n_wb = h // bh, w // bw
    eps = 1e-6

    def kernel(p1_hbm, c0_hbm,
               kO1_ref, bO1_ref, kO2_ref, bO2_ref,
               kG1_ref, bG1_ref, kG2_ref, bG2_ref, sG_ref, bG_ref, kG3_ref,
               kGF_ref, bGF_ref, kO3_ref, bO3_ref,
               lf_ref, out_ref,
               p1_v, c0_v, sems):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        r0 = hi * bh
        w0 = wi * bw
        lin = (ni * n_hb + hi) * n_wb + wi
        slot = jax.lax.rem(lin, 2)

        def window_dmas(b_ni, b_hi, b_wi, b_slot):
            br, bw0 = b_hi * bh, b_wi * bw
            return [
                pltpu.make_async_copy(
                    p1_hbm.at[b_ni, pl.ds(br, bh + 8), pl.ds(bw0, bw + 8)],
                    p1_v.at[b_slot], sems.at[b_slot, 0]),
                pltpu.make_async_copy(
                    c0_hbm.at[b_ni, pl.ds(br + 3, bh + 2), pl.ds(bw0 + 3, bw + 2)],
                    c0_v.at[b_slot], sems.at[b_slot, 1]),
            ]

        @pl.when(lin == 0)
        def _():
            for cp_ in window_dmas(ni, hi, wi, slot):
                cp_.start()

        for cp_ in window_dmas(ni, hi, wi, slot):
            cp_.wait()

        nxt = lin + 1

        @pl.when(nxt < n * n_hb * n_wb)
        def _():
            rem = jax.lax.rem(nxt, n_hb * n_wb)
            for cp_ in window_dmas(nxt // (n_hb * n_wb), rem // n_wb,
                                   jax.lax.rem(rem, n_wb), jax.lax.rem(nxt, 2)):
                cp_.start()

        def zero_outside(y, ext):
            ry, rx = y.shape[0], y.shape[1]
            rg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 0) + r0 - ext
            cg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 1) + w0 - ext
            ok = (rg >= 0) & (rg < h) & (cg >= 0) & (cg < w)
            return y * ok.astype(y.dtype)

        f32 = jnp.float32

        # ---- output_conv1 (256 -> 128), ext 3
        xim = _im2col_w([p1_v[slot]], bw + 6)
        o1 = (_conv3dot(xim, kO1_ref[...], bh + 6)
              + bO1_ref[0].astype(f32)).astype(dtype)
        o1 = zero_outside(o1, 3)

        # ---- output_conv2 (128 -> 32) + relu, ext 2
        xim = _im2col_w([o1], bw + 4)
        lf0 = (_conv3dot(xim, kO2_ref[...], bh + 4)
               + bO2_ref[0].astype(f32)).astype(dtype)
        lf0 = zero_outside(jnp.maximum(lf0, 0.0), 2)

        # ---- GCU residual conv, ext 1
        xim = _im2col_w([jnp.maximum(lf0, 0.0)], bw + 2)
        g1 = (_conv3dot(xim, kG1_ref[...], bh + 2)
              + bG1_ref[0].astype(f32)).astype(dtype)
        g1 = g1 + lf0[1:-1, 1:-1, :]
        g1 = zero_outside(g1, 1)

        # ---- GCU fusion conv over cat(g1, c0) + LN + relu + 1x1 + gate
        xim = _im2col_w([g1, c0_v[slot]], bw)
        f = (_conv3dot(xim, kG2_ref[...], bh)
             + bG2_ref[0].astype(f32)).astype(dtype)
        xf = f.astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        mul = jax.lax.rsqrt(var + eps) * sG_ref[0].astype(f32)
        ln = ((xf - mean) * mul + bG_ref[0].astype(f32)).astype(dtype)
        proj = jax.lax.dot_general(
            jnp.maximum(ln, 0.0), kG3_ref[...],
            (((2,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(dtype)
        if gate:
            # f32 sigmoid: mosaic's bf16 logistic lowering fails its own
            # verifier on real TPUs (see ops/fused_gcu.py)
            y = g1[1 : bh + 1, 1 : bw + 1, :] * jax.nn.sigmoid(
                proj.astype(f32)).astype(dtype)
        else:
            y = proj

        # ---- GatedFusionBlock 1x1 out conv
        lf = (jax.lax.dot_general(
            y, kGF_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bGF_ref[0].astype(f32)).astype(dtype)
        lf_ref[0] = lf

        # ---- output_conv3 (1 channel): VPU lane-reduce
        off = jnp.sum(lf.astype(f32) * kO3_ref[0].astype(f32)[None, None, :], axis=-1)
        out_ref[0] = (off + bO3_ref[0, 0].astype(f32)).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # p1, pre-padded 4
            pl.BlockSpec(memory_space=pl.ANY),  # c0, pre-padded 4
            pl.BlockSpec((3, 3 * cp, cm), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, cm), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * cm, ct), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * ct, ct), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * (ct + cc), ct), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((ct, ct), lambda *_: (0, 0)),
            pl.BlockSpec((ct, ct), lambda *_: (0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((1, ct), lambda *_: (0, 0)),
            pl.BlockSpec((1, 1), lambda *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, bw, ct), lambda ni, hi, wi: (ni, hi, wi, 0)),
            pl.BlockSpec((1, bh, bw), lambda ni, hi, wi: (ni, hi, wi)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bh + 8, bw + 8, cp), dtype),
            pltpu.VMEM((2, bh + 2, bw + 2, cc), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, ct), dtype),
            jax.ShapeDtypeStruct((n, h, w), dtype),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * (9 * cp * cm + 9 * cm * ct + 9 * ct * ct
                                   + 9 * (ct + cc) * ct + 3 * ct * ct),
            bytes_accessed=n * h * w * (cp + cc + ct + 1) * dtype.itemsize,
            transcendentals=2 * n * h * w * ct,
        ),
    )


def fused_c2f_head(p1, c0, kO1, bO1, kO2, bO2, kG1, bG1, kG2, bG2, lnG,
                   kG3, kGF, bGF, kO3, bO3, gate=True, interpret=None):
    """Run the fused C2F out-head.

    p1: (N,H,W,Cp) refinenet1 output; c0: (N,H,W,Cc) level-0 coarse feature;
    kO1/kO2/kG1/kG2: HWIO 3x3 kernels; kG3/kGF: 1x1; kO3: (1,1,Ct,1); lnG:
    (scale, bias). Returns (last_feat (N,H,W,Ct), out (N,H,W,1)).
    """
    n, h, w, cp = p1.shape
    cc = c0.shape[-1]
    cm = kO1.shape[-1]
    ct = kO2.shape[-1]
    dt = p1.dtype
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    pad4 = ((0, 0), (_HEAD_HALO, _HEAD_HALO), (_HEAD_HALO, _HEAD_HALO), (0, 0))
    call = _build_head(n, h, w, cp, cm, ct, cc, bool(gate),
                       jnp.dtype(dt).name, bool(interpret))
    lf, out = call(
        jnp.pad(p1, pad4),
        jnp.pad(c0.astype(dt), pad4),
        _k3(kO1).astype(dt),
        bO1.reshape(1, cm).astype(dt),
        _k3(kO2).astype(dt),
        bO2.reshape(1, ct).astype(dt),
        _k3(kG1).astype(dt),
        bG1.reshape(1, ct).astype(dt),
        _k3(kG2).astype(dt),
        bG2.reshape(1, ct).astype(dt),
        lnG[0].reshape(1, ct).astype(dt),
        lnG[1].reshape(1, ct).astype(dt),
        kG3.reshape(ct, ct).astype(dt),
        kGF.reshape(ct, ct).astype(dt),
        bGF.reshape(1, ct).astype(dt),
        kO3.reshape(1, ct).astype(dt),
        bO3.reshape(1, 1).astype(dt),
    )
    return lf, out[..., None]


# --------------------------------------------------------------------------
# Fused mid-level fusion pair: one BiDirectionalFusion f2r encoder level
# (bi_directional_fusion_model.py:417-425)
#
#     h1 = gelu(LN(conv3x3(cat(c, f), kA)))      # fusion1_i
#     h2 = gelu(LN(conv3x3(cat(h1, p1, p2), kB)))  # fusion2_i
#
# for levels >= 1 (level 0 belongs to the fused f2r tail). The pred maps
# arrive already interpolated to this level's grid (1-channel resize
# matmuls fuse fine in XLA). Two convs -> halo 2.
# --------------------------------------------------------------------------


def _pair_vmem_need(bh, bw, cc, cf, tc, itemsize):
    win = 2 * (
        (bh + 4) * (bw + 4) * (_lanes(cc) + _lanes(cf))
        + (bh + 2) * (bw + 2) * _lanes(2)
    ) * itemsize
    stage_a = (
        (bh + 4) * (bw + 2) * _lanes(3 * (cc + cf)) * itemsize
        + (bh + 2) * (bw + 2) * _lanes(tc) * (4 + itemsize)
    )
    stage_b = (
        (bh + 2) * bw * _lanes(3 * (tc + 2)) * itemsize
        + bh * bw * _lanes(tc) * (4 + 2 * itemsize)
    )
    return win + max(stage_a, stage_b) + (bh + 2) * (bw + 2) * _lanes(tc) * itemsize


def _pair_pick_blocks(h, w, cc, cf, tc, itemsize):
    budget = 11 * 1024 * 1024
    for bw in (256, 128):
        if w % bw:
            continue
        for bh in (8, 4):
            if h % bh:
                continue
            if _pair_vmem_need(bh, bw, cc, cf, tc, itemsize) < budget:
                return bh, bw
    return None


def fused_pair_supported(shape, cf: int, tc: int, dtype=jnp.bfloat16) -> bool:
    if os.environ.get("PRV2_FUSED_PAIR", "") in ("", "0", "false"):
        return False
    if jnp.dtype(dtype).itemsize != 2 and not os.environ.get("PRV2_FUSED_FORCE"):
        return False
    n, h, w, cc = shape
    if w % 128 or w > 1024 or h % 4 or h < 16:
        return False
    if cc + cf > 1024 or tc > 128:
        return False
    return _pair_pick_blocks(h, w, cc, cf, tc, 2) is not None


@functools.lru_cache(maxsize=None)
def _build_pair(n, h, w, cc, cf, tc, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    blocks = _pair_pick_blocks(h, w, cc, cf, tc, dtype.itemsize)
    _e = os.environ.get("PRV2_PAIR_BLOCKS", "")
    if _e:
        bh, bw = (int(t) for t in _e.split("x"))
        if h % bh == 0 and w % bw == 0:
            blocks = (bh, bw)
    if blocks is None:
        raise ValueError(f"no block size fits VMEM for {(n, h, w)}")
    bh, bw = blocks
    n_hb, n_wb = h // bh, w // bw
    eps = 1e-6

    def ln_gelu(acc, s_ref, b_ref):
        acc = acc.astype(dtype).astype(jnp.float32)
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (acc - mean) * jax.lax.rsqrt(var + eps)
        y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        return _gelu(y.astype(dtype))

    def kernel(c_hbm, f_hbm, pp_hbm, kA_ref, sA_ref, bA_ref,
               kB_ref, sB_ref, bB_ref, out_ref, c_v, f_v, pp_v, sems):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        r0 = hi * bh
        w0 = wi * bw
        lin = (ni * n_hb + hi) * n_wb + wi
        slot = jax.lax.rem(lin, 2)

        def window_dmas(b_ni, b_hi, b_wi, b_slot):
            br, bw0 = b_hi * bh, b_wi * bw
            return [
                pltpu.make_async_copy(
                    c_hbm.at[b_ni, pl.ds(br, bh + 4), pl.ds(bw0, bw + 4)],
                    c_v.at[b_slot], sems.at[b_slot, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[b_ni, pl.ds(br, bh + 4), pl.ds(bw0, bw + 4)],
                    f_v.at[b_slot], sems.at[b_slot, 1]),
                pltpu.make_async_copy(
                    pp_hbm.at[b_ni, pl.ds(br + 1, bh + 2), pl.ds(bw0 + 1, bw + 2)],
                    pp_v.at[b_slot], sems.at[b_slot, 2]),
            ]

        @pl.when(lin == 0)
        def _():
            for cp_ in window_dmas(ni, hi, wi, slot):
                cp_.start()

        for cp_ in window_dmas(ni, hi, wi, slot):
            cp_.wait()

        nxt = lin + 1

        @pl.when(nxt < n * n_hb * n_wb)
        def _():
            rem = jax.lax.rem(nxt, n_hb * n_wb)
            for cp_ in window_dmas(nxt // (n_hb * n_wb), rem // n_wb,
                                   jax.lax.rem(rem, n_wb), jax.lax.rem(nxt, 2)):
                cp_.start()

        def zero_outside(y, ext):
            ry, rx = y.shape[0], y.shape[1]
            rg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 0) + r0 - ext
            cg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 1) + w0 - ext
            ok = (rg >= 0) & (rg < h) & (cg >= 0) & (cg < w)
            return y * ok.astype(y.dtype)

        xim = _im2col_w([c_v[slot], f_v[slot]], bw + 2)
        h1 = ln_gelu(_conv3dot(xim, kA_ref[...], bh + 2), sA_ref, bA_ref)
        h1 = zero_outside(h1, 1)

        xim = _im2col_w([h1, pp_v[slot]], bw)
        out_ref[0] = ln_gelu(_conv3dot(xim, kB_ref[...], bh), sB_ref, bB_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # c, pre-padded 2
            pl.BlockSpec(memory_space=pl.ANY),  # f
            pl.BlockSpec(memory_space=pl.ANY),  # pp
            pl.BlockSpec((3, 3 * (cc + cf), tc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((3, 3 * (tc + 2), tc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
            pl.BlockSpec((1, tc), lambda *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, tc), lambda ni, hi, wi: (ni, hi, wi, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 4, bw + 4, cc), dtype),
            pltpu.VMEM((2, bh + 4, bw + 4, cf), dtype),
            pltpu.VMEM((2, bh + 2, bw + 2, 2), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, tc), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * tc * (cc + cf + tc + 2),
            bytes_accessed=n * h * w * (cc + cf + tc + 2) * dtype.itemsize,
            transcendentals=4 * n * h * w * tc,
        ),
    )


def fused_fusion_pair(c, f, pred1, pred2, kA, lnA, kB, lnB, interpret=None):
    """One f2r encoder level: h2 = CNNLN(cat(CNNLN(cat(c, f)), p1, p2)).

    c/f: (N,h,w,*) level features; pred1/pred2: (N,h,w,1) already at this
    level's grid. Returns (N,h,w,tc)."""
    n, h, w, cc = c.shape
    cf = f.shape[-1]
    tc = kA.shape[-1]
    dt = c.dtype
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    pad2 = ((0, 0), (2, 2), (2, 2), (0, 0))
    pp = jnp.concatenate([pred1, pred2], axis=-1).astype(dt)
    call = _build_pair(n, h, w, cc, cf, tc, jnp.dtype(dt).name, bool(interpret))
    return call(
        jnp.pad(c, pad2),
        jnp.pad(f.astype(dt), pad2),
        jnp.pad(pp, pad2),
        _k3(kA).astype(dt),
        lnA[0].reshape(1, tc).astype(dt),
        lnA[1].reshape(1, tc).astype(dt),
        _k3(kB).astype(dt),
        lnB[0].reshape(1, tc).astype(dt),
        lnB[1].reshape(1, tc).astype(dt),
    )


# --------------------------------------------------------------------------
# Fused UpSample DoubleConv: one decoder stage of the f2r chain
# (fusion_model.py:7-35)
#
#     d1  = gelu(conv3x3(cat(x1up, feat, p1, p2), kC))
#     out = gelu(conv3x3(d1, kD))
#
# for mid levels whose grid is lane-aligned (the level-0 instance belongs
# to the fused f2r tail). x1up and the preds arrive already interpolated
# to this level's grid. Two convs -> halo 2.
# --------------------------------------------------------------------------


def _dc_vmem_need(bh, bw, cx, ct, midc, outc, itemsize):
    win = 2 * (
        (bh + 4) * (bw + 4) * (_lanes(cx) + _lanes(ct))
        + (bh + 2) * (bw + 2) * _lanes(2)
    ) * itemsize
    stage_c = (
        (bh + 4) * (bw + 2) * _lanes(3 * midc) * itemsize
        + (bh + 2) * (bw + 2) * _lanes(midc) * (4 + itemsize)
    )
    stage_d = (
        (bh + 2) * bw * _lanes(3 * midc) * itemsize
        + bh * bw * _lanes(outc) * (4 + 2 * itemsize)
    )
    return win + max(stage_c, stage_d) + (bh + 2) * (bw + 2) * _lanes(midc) * itemsize


def _dc_pick_blocks(h, w, cx, ct, midc, outc, itemsize):
    budget = 11 * 1024 * 1024
    for bw in (256, 128):
        if w % bw:
            continue
        for bh in (8, 4):
            if h % bh:
                continue
            if _dc_vmem_need(bh, bw, cx, ct, midc, outc, itemsize) < budget:
                return bh, bw
    return None


def fused_dc_supported(shape, ct: int, outc: int, dtype=jnp.bfloat16) -> bool:
    if os.environ.get("PRV2_FUSED_DC", "") in ("", "0", "false"):
        return False
    if jnp.dtype(dtype).itemsize != 2 and not os.environ.get("PRV2_FUSED_FORCE"):
        return False
    n, h, w, cx = shape
    if w % 128 or w > 1024 or h % 4 or h < 16:
        return False
    midc = cx + ct + 2
    if midc > 512 or outc > 256:
        return False
    return _dc_pick_blocks(h, w, cx, ct, midc, outc, 2) is not None


@functools.lru_cache(maxsize=None)
def _build_dc(n, h, w, cx, ct, midc, outc, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    blocks = _dc_pick_blocks(h, w, cx, ct, midc, outc, dtype.itemsize)
    _e = os.environ.get("PRV2_DC_BLOCKS", "")
    if _e:
        bh, bw = (int(t) for t in _e.split("x"))
        if h % bh == 0 and w % bw == 0:
            blocks = (bh, bw)
    if blocks is None:
        raise ValueError(f"no block size fits VMEM for {(n, h, w)}")
    bh, bw = blocks
    n_hb, n_wb = h // bh, w // bw

    def kernel(x_hbm, f_hbm, pp_hbm, kC_ref, kD_ref, out_ref,
               x_v, f_v, pp_v, sems):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        r0 = hi * bh
        w0 = wi * bw
        lin = (ni * n_hb + hi) * n_wb + wi
        slot = jax.lax.rem(lin, 2)

        def window_dmas(b_ni, b_hi, b_wi, b_slot):
            br, bw0 = b_hi * bh, b_wi * bw
            return [
                pltpu.make_async_copy(
                    x_hbm.at[b_ni, pl.ds(br, bh + 4), pl.ds(bw0, bw + 4)],
                    x_v.at[b_slot], sems.at[b_slot, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[b_ni, pl.ds(br, bh + 4), pl.ds(bw0, bw + 4)],
                    f_v.at[b_slot], sems.at[b_slot, 1]),
                pltpu.make_async_copy(
                    pp_hbm.at[b_ni, pl.ds(br, bh + 4), pl.ds(bw0, bw + 4)],
                    pp_v.at[b_slot], sems.at[b_slot, 2]),
            ]

        @pl.when(lin == 0)
        def _():
            for cp_ in window_dmas(ni, hi, wi, slot):
                cp_.start()

        for cp_ in window_dmas(ni, hi, wi, slot):
            cp_.wait()

        nxt = lin + 1

        @pl.when(nxt < n * n_hb * n_wb)
        def _():
            rem = jax.lax.rem(nxt, n_hb * n_wb)
            for cp_ in window_dmas(nxt // (n_hb * n_wb), rem // n_wb,
                                   jax.lax.rem(rem, n_wb), jax.lax.rem(nxt, 2)):
                cp_.start()

        def zero_outside(y, ext):
            ry, rx = y.shape[0], y.shape[1]
            rg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 0) + r0 - ext
            cg = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 1) + w0 - ext
            ok = (rg >= 0) & (rg < h) & (cg >= 0) & (cg < w)
            return y * ok.astype(y.dtype)

        # conv C over the (bh+2, bw+2) extended region conv D's halo reads
        xim = _im2col_w([x_v[slot], f_v[slot], pp_v[slot]], bw + 2)
        d1 = _gelu(_conv3dot(xim, kC_ref[...], bh + 2).astype(dtype))
        d1 = zero_outside(d1, 1)

        xim = _im2col_w([d1], bw)
        out_ref[0] = _gelu(_conv3dot(xim, kD_ref[...], bh).astype(dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x1up, pre-padded 2
            pl.BlockSpec(memory_space=pl.ANY),  # feat
            pl.BlockSpec(memory_space=pl.ANY),  # pp
            pl.BlockSpec((3, 3 * midc, midc), lambda *_: (0, 0, 0)),
            pl.BlockSpec((3, 3 * midc, outc), lambda *_: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, outc), lambda ni, hi, wi: (ni, hi, wi, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 4, bw + 4, cx), dtype),
            pltpu.VMEM((2, bh + 4, bw + 4, ct), dtype),
            pltpu.VMEM((2, bh + 4, bw + 4, 2), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, outc), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * midc * (midc + outc),
            bytes_accessed=n * h * w * (cx + ct + outc + 2) * dtype.itemsize,
            transcendentals=2 * n * h * w * (midc + outc),
        ),
    )


def fused_upsample_dc(x1up, feat, pred1, pred2, kC, kD, interpret=None):
    """One UpSample DoubleConv: gelu(conv(gelu(conv(cat(x1up, feat, p1,
    p2))))). All inputs at this level's grid; returns (N,h,w,outc)."""
    n, h, w, cx = x1up.shape
    ct = feat.shape[-1]
    midc = kC.shape[2]  # HWIO cin
    outc = kD.shape[-1]
    dt = x1up.dtype
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    pad2 = ((0, 0), (2, 2), (2, 2), (0, 0))
    pp = jnp.concatenate([pred1, pred2], axis=-1).astype(dt)
    call = _build_dc(n, h, w, cx, ct, midc, outc, jnp.dtype(dt).name,
                     bool(interpret))
    return call(
        jnp.pad(x1up.astype(dt), pad2),
        jnp.pad(feat.astype(dt), pad2),
        jnp.pad(pp, pad2),
        _k3(kC).astype(dt),
        _k3(kD).astype(dt),
    )
