"""Fused GatedConvUnit (Pallas TPU): the C2F decoder's hot block as one
VMEM-resident chain.

The reference GatedConvUnit (estimator/models/blocks/
bi_directional_fusion_model.py:26-82) is

    out   = x + conv3x3(relu(x), w1) + b1           # residual conv
    fused = conv3x3(cat(out, c_feat), w2) + b2      # coarse-feature fusion
    fused = conv1x1(relu(LN(fused)), w3)            # LayerNorm + projection
    y     = out * sigmoid(fused)   (gate=True)      # or y = fused

and its instances at 192x256x256 / 96x128x256 dominate the flagship
inference frame: XLA executes the chain as several HBM round trips
(conv fusions profiled at ~50% MXU on v5e, xprof in docs/performance.md).
This kernel keeps the whole chain in VMEM per (batch, row-block) grid
step: one read of x (with a 2-row halo for the two chained 3x3 convs),
one read of the coarse partial sum, one write of y.

The concat never exists: conv3x3(cat(out, c), w2) == conv3x3(out, w2a) +
conv3x3(c, w2b) with w2 split along its input axis. The coarse half
(p2b = conv3x3(c_feat, w2b)) is left to XLA, where it runs as one clean
MXU conv with no halo dependence on kernel intermediates; the kernel adds
it to its own `out` half.

Two fusion scopes (picked by ``mode``):
* ``full``  — everything above in one kernel (x in HBM, 2-row halo).
* ``tail``  — conv1 stays in XLA (a single well-fused conv); the kernel
  fuses conv2a + LN + relu + 1x1 + sigmoid-gate over a 1-row halo of
  `out`. Half the in-kernel dots — the fallback if `full` trips mosaic's
  compile-time or scoped-VMEM ceilings (see ops/fused_tail.py history).

Halo semantics (the ops/fused_tail.py lesson): a SAME-conv output AT an
out-of-tensor position is nonzero (it sees real edge rows) and carries the
bias, but the next conv must read zeros there — the intermediate `out` is
re-zeroed outside the true tensor before the second conv.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_gcu_mode", "gated_conv_unit_fused"]


def fused_gcu_mode(shape, features: int, dtype) -> str:
    """'' when unsupported, else the kernel mode from PRV2_FUSED_GCU
    (``1``/``full`` or ``tail``; default off until measured on-chip)."""
    flag = os.environ.get("PRV2_FUSED_GCU", "")
    if flag in ("", "0", "false"):
        return ""
    mode = "tail" if flag == "tail" else "full"
    n, h, w, c = shape
    # c >= 128 runs plain 3D dots (lane-aligned). The small-C width-im2col
    # form (e.g. the 32-ch full-res output_conv2_fusion instance) crashes
    # the remote Mosaic compiler at every block size tried (bh=4,2 —
    # HTTP-500 helper exit 1, v5e 2026-08), so it is interpret/test-only
    # (PRV2_FUSED_FORCE); on hardware those instances stay on XLA.
    if c != features or c > 512:
        return ""
    if c % 128:
        if not os.environ.get("PRV2_FUSED_FORCE"):
            return ""
        if c > 96 or c % 8:
            return ""
    if w % 128 or w > 1024:
        return ""
    if h % 8 or h < 16:
        return ""
    # inference-only: pallas_call has no VJP, and the training path runs
    # f32 (PRV2_FUSED_FORCE lifts the dtype gate for interpret-mode tests)
    if jnp.dtype(dtype).itemsize != 2 and not os.environ.get("PRV2_FUSED_FORCE"):
        return ""
    return mode


def _lanes(c):
    return -(-c // 128) * 128


def _pick_bh(h: int, w: int, c: int, itemsize: int, mode: str = "full") -> int:
    """Row-block size: keep every live VMEM buffer under the ceiling the
    remote Mosaic compiler tolerates (it crashes with an opaque HTTP-500
    "tpu_compile_helper subprocess exit code 1" instead of a scoped-vmem
    error when the kernel's working set is too big).

    The budgets and the per-mode footprint formulas are calibrated against
    on-chip anchors at the hot 192x256x256 bf16 instance (v5e, 2026-08):
    tail bh=8 OK (est 15.5 MB) / bh=16 FAIL (30.2 MB); full bh=2 OK
    (9.8 MB) / bh=4 FAIL (15.5 MB). full's budget is tighter than tail's
    at near-equal byte estimates — its two chained convs + iota masks add
    compiler pressure the byte count misses."""
    budget = (12 if mode == "full" else 16) * 1024 * 1024
    cl = _lanes(c)
    im2col = _lanes(3 * c) if c < 128 else 0  # small-C im2col buffer lanes
    it = itemsize
    for bh in (16, 8, 4, 2):
        if h % bh:
            continue
        halo = 2 if mode == "full" else 1
        win = bh + 2 * halo
        need = (
            2 * win * w * cl * it      # x window, double-buffered
            + 4 * bh * w * cl * it     # p2b + out blocks, double-buffered
            + 2 * bh * w * cl * 4      # conv2 f32 acc + LN f32 temp
            + 3 * bh * w * cl * it     # ln / proj / sig
            + win * (w + 2) * im2col * it  # width-im2col buffer (small C)
        )
        if mode == "full":
            need += (
                2 * win * (w + 4) * cl * it        # xpad + relu'd copy
                + (bh + 2) * (w + 2) * cl * 4      # conv1 f32 acc
                + 2 * (bh + 2) * (w + 2) * cl * it  # conv1 + out_ext
                + 3 * (bh + 2) * (w + 2) * 128 * 4  # rg/cg/ok iota masks
            )
        else:
            need += (bh + 2) * (w + 2) * cl * it  # out_ext col-pad
        if need < budget:
            return bh
    return 0


@functools.lru_cache(maxsize=None)
def _build(n, h, w, c, mode, gate, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    bh_env = int(os.environ.get("PRV2_GCU_BH", 0))
    bh = bh_env if bh_env and h % bh_env == 0 else _pick_bh(h, w, c, dtype.itemsize, mode)
    if bh == 0:
        raise ValueError(f"no row block fits VMEM for {(n, h, w, c)}")
    halo = 2 if mode == "full" else 1
    win = bh + 2 * halo
    n_hb = h // bh
    eps = 1e-6
    small = c < 128
    kshape = (3, 3 * c, c) if small else (3, 3, c, c)
    kmap = (lambda ni, hi: (0, 0, 0)) if small else (lambda ni, hi: (0, 0, 0, 0))

    def kernel(xp_hbm, p2b_ref, k1_ref, b1_ref, k2a_ref, b2_ref, ls_ref,
               lb_ref, k3_ref, out_ref, x_vmem, sem):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        lin = ni * n_hb + hi
        slot = jax.lax.rem(lin, 2)

        def band_dma(b_ni, b_hi, b_slot):
            return pltpu.make_async_copy(
                xp_hbm.at[b_ni, pl.ds(b_hi * bh, win)],
                x_vmem.at[b_slot],
                sem.at[b_slot],
            )

        @pl.when(lin == 0)
        def _():
            band_dma(ni, hi, slot).start()

        band_dma(ni, hi, slot).wait()
        nxt = lin + 1

        @pl.when(nxt < n * n_hb)
        def _():
            band_dma(nxt // n_hb, jax.lax.rem(nxt, n_hb), jax.lax.rem(nxt, 2)).start()

        def conv3x3(src, w_ref, rows, cols):
            """9-tap SAME conv: src is (rows+2, cols+2, C) pre-padded; f32.

            c >= 128: 9 lane-aligned 3D dots with the HWIO weights.
            c < 128: width-im2col (lanes 3C) + one dot per row tap, so the
            MXU sees a 3x fatter K instead of a 4x lane-padded one."""
            if small:
                xim = jnp.concatenate(
                    [src[:, dx : dx + cols, :] for dx in range(3)], axis=-1
                )
                acc = jnp.zeros((rows, cols, c), jnp.float32)
                for dy in range(3):
                    acc = acc + jax.lax.dot_general(
                        xim[dy : dy + rows],
                        w_ref[dy],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                return acc
            acc = jnp.zeros((rows, cols, c), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + jax.lax.dot_general(
                        src[dy : dy + rows, dx : dx + cols, :],
                        w_ref[dy, dx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            return acc

        xw = x_vmem[slot]  # (win, W, C)

        if mode == "full":
            xpad = jnp.pad(xw, ((0, 0), (2, 2), (0, 0)))  # (bh+4, W+4, C)
            # conv1 over the extended region (bh+2, W+2) that conv2 reads
            # NB: dtype-matched zero — a python-float 0.0 here lowers to a
            # `vector.broadcast f32 -> bf16` that trips mosaic's verifier
            # on real TPUs (interpret mode doesn't catch it)
            acc1 = conv3x3(jnp.maximum(xpad, jnp.zeros((), xpad.dtype)),
                           k1_ref, bh + 2, w + 2)
            conv1 = (acc1 + b1_ref[0].astype(jnp.float32)).astype(dtype)
            out_ext = conv1 + xpad[1 : bh + 3, 1 : w + 3, :]
            # re-zero out-of-tensor rows/cols (position (r, j) maps to tensor
            # coords (hi*bh + r - 1, j - 1))
            rg = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2, 1), 0) + hi * bh - 1
            cg = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, w + 2, 1), 1) - 1
            ok = (rg >= 0) & (rg < h) & (cg >= 0) & (cg < w)
            out_ext = out_ext * ok.astype(dtype)
        else:
            # `out` computed by XLA, window already zero-padded rows; pad cols
            out_ext = jnp.pad(xw, ((0, 0), (1, 1), (0, 0)))  # (bh+2, W+2, C)

        acc2 = conv3x3(out_ext, k2a_ref, bh, w)
        acc2 = acc2 + p2b_ref[0].astype(jnp.float32) + b2_ref[0].astype(jnp.float32)
        fused = acc2.astype(dtype)  # round like the XLA conv output

        # LayerNorm over C, flax op order (stats in f32, fast variance)
        xf = fused.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        mul = jax.lax.rsqrt(var + eps) * ls_ref[0].astype(jnp.float32)
        ln = ((xf - mean) * mul + lb_ref[0].astype(jnp.float32)).astype(dtype)

        proj = jax.lax.dot_general(
            jnp.maximum(ln, jnp.zeros((), ln.dtype)), k3_ref[...],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

        if gate:
            # sigmoid runs in f32: mosaic's bf16 logistic lowering emits a
            # `vector.broadcast f32 -> bf16` that fails the verifier on real
            # TPUs (repro'd on v5e; interpret mode doesn't catch it). XLA's
            # own bf16 sigmoid also upcasts, so rounding matches the chain.
            sig = jax.nn.sigmoid(proj.astype(jnp.float32)).astype(dtype)
            out_ref[0] = out_ext[1 : bh + 1, 1 : w + 1, :] * sig
        else:
            out_ref[0] = proj

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, n_hb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pre-padded x / out
            pl.BlockSpec((1, bh, w, c), lambda ni, hi: (ni, hi, 0, 0)),
            pl.BlockSpec(kshape, kmap),
            pl.BlockSpec((1, c), lambda ni, hi: (0, 0)),
            pl.BlockSpec(kshape, kmap),
            pl.BlockSpec((1, c), lambda ni, hi: (0, 0)),
            pl.BlockSpec((1, c), lambda ni, hi: (0, 0)),
            pl.BlockSpec((1, c), lambda ni, hi: (0, 0)),
            pl.BlockSpec((c, c), lambda ni, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda ni, hi: (ni, hi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win, w, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops_conv1 = 2 * n * h * w * 9 * c * c if mode == "full" else 0
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_conv1 + 2 * n * h * w * c * (9 * c + c),
            bytes_accessed=3 * n * h * w * c * dtype.itemsize,
            transcendentals=n * h * w * c,
        ),
    )


def gated_conv_unit_fused(x, p2b, k1, b1, k2a, b2, ln_scale, ln_bias, k3,
                          *, gate=True, mode="full", interpret=None):
    """Apply the fused GatedConvUnit.

    x: (N, H, W, C) input (``full``) or the precomputed residual `out`
    (``tail``); p2b: conv3x3(c_feat, w2b) — the coarse half of the fusion
    conv, bias NOT included; k1/b1 ignored in ``tail`` mode (pass anyway
    for a uniform signature); k3: (C, C) 1x1 projection.
    Returns (N, H, W, C).
    """
    n, h, w, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    halo = 2 if mode == "full" else 1
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    call = _build(n, h, w, c, mode, bool(gate), jnp.dtype(x.dtype).name,
                  bool(interpret))
    dt = x.dtype
    if c < 128:  # width-im2col weights: (3, 3*Cin, Cout), (dx, cin) lanes
        k1 = k1.reshape(3, 3 * c, c)
        k2a = k2a.reshape(3, 3 * c, c)
    return call(
        xp,
        p2b.astype(dt),
        k1.astype(dt),
        b1.reshape(1, c).astype(dt),
        k2a.astype(dt),
        b2.reshape(1, c).astype(dt),
        ln_scale.reshape(1, c).astype(dt),
        ln_bias.reshape(1, c).astype(dt),
        k3.reshape(c, c).astype(dt),
    )
