"""Space-to-depth re-layout for the low-channel full-resolution tail.

Motivation (r32 xprof, docs/performance.md): the fusion head's 32-channel
full-resolution segment — C2F ``output_conv2`` -> ``GatedConvUnit(32)``
head -> ``output_conv3``, the ``fusion1_0``/``fusion2_0`` convs, and
``final_conv`` — runs at 4-10x below both MXU and HBM peak because a
C<=34 channel axis fills only a quarter (or 1/128th, for the 1-channel
offset maps) of the TPU's 128-wide lane tiles; every byte of padding is
physically moved. Roughly 250 ms of the 1.2 s r32 frame sits in those
ops at <=25% efficiency.

The fix is a layout change, not an approximation: carry that segment in
space-to-depth form — ``(N, H, W, C) -> (N, H/2, W/2, 4C)`` — so C=32
becomes 128 lanes (full tile). 3x3 SAME convolutions commute with the
re-layout EXACTLY when the kernel is expanded with structural zeros:

* ``s2d_same_kernel``: a stride-1 3x3 SAME conv on the original grid is
  a 3x3 SAME conv on the s2d grid with a ``(3, 3, 4C, 4Co)`` kernel —
  output phase (di, dj) reading input phase (si, sj) at block offset
  (p, q), where ``t = di + du - 1``, ``p = t//2 + 1``, ``si = t % 2``
  (and likewise for columns). Half the expanded taps are zero; the MXU
  multiplies them anyway, trading 4x FLOPs for 4x lane occupancy — a
  win exactly when C is small (here: 4x fewer bytes moved AND the op
  usually flips from memory- to compute-bound).
* ``s2d_down_kernel``: ``s2d(conv3x3(x))`` computed directly from the
  full-resolution input as ONE stride-2 conv with a ``(4, 4, C, 4Co)``
  kernel (tap ``t = di + du`` in 0..3, padding (1,1)) — this is how the
  segment ENTERS s2d form without a separate relayout pass.
* 1x1 convs become block-diagonal ``(1, 1, 4C, 4Co)`` kernels.
* ``cat_permutation``: channel-concat does not commute with s2d
  (``s2d(cat(a, b)) != cat(s2d(a), s2d(b))`` — the phase groups
  interleave differently), so kernels consuming concatenated inputs are
  re-indexed to accept the ``cat(s2d(a), s2d(b))`` order instead.
* ``layer_norm_s2d``: per-pixel channel LN over the ORIGINAL C channels
  = per-phase-group LN in s2d form; computed with block-diagonal dot
  reductions (same trick as DotLayerNorm) to stay in the conv layout.

Everything here is exact up to f32 accumulation order (the zero taps
contribute exactly 0.0), so the mode is parity-preserving — unlike int8
— and is pinned against the plain path by tests/test_s2d.py.

No reference counterpart: the reference runs these ops as-is on CUDA
(estimator/models/blocks/bi_directional_fusion_model.py:148-208,417-446),
where cuDNN handles C=32 tiles natively; the re-layout is TPU-specific.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "s2d_enabled",
    "space_to_depth",
    "depth_to_space",
    "s2d_same_kernel",
    "s2d_down_kernel",
    "s2d_1x1_kernel",
    "tile_bias",
    "conv_s2d_down",
    "layer_norm_s2d",
]


def s2d_enabled() -> bool:
    """Trace-time switch for the s2d tail layout (default ON — the mode
    is numerically exact; ``PRV2_S2D=0`` restores the plain layout)."""
    return os.environ.get("PRV2_S2D", "1") not in ("0", "false")


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); phase group (si, sj) is
    channel-major: lane block g = si*2 + sj holds original channels."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def _cat_perm(split: tuple[int, ...]) -> np.ndarray:
    """Index array mapping ``cat(s2d(a), s2d(b), ...)`` channel order to
    the ``s2d(cat(a, b, ...))`` order an expanded kernel expects.

    perm[j] = position in cat-of-s2d of the channel that s2d-of-cat puts
    at j, so ``kernel_for_cat_of_s2d = s2d_kernel[:, :, perm_inv, :]``
    — returned directly in the take-friendly direction.
    """
    total = sum(split)
    bases = np.cumsum([0] + list(split))[:-1]
    take = np.empty(4 * total, np.int64)
    for g in range(4):
        for cp, base in zip(split, bases):
            # cat-of-s2d index block: 4*base + g*cp .. +cp   (tensor we have)
            # s2d-of-cat index block: g*total + base .. +cp  (kernel layout)
            take[4 * base + g * cp : 4 * base + (g + 1) * cp] = (
                g * total + base + np.arange(cp)
            )
    return take


def s2d_same_kernel(k: jnp.ndarray, split: tuple[int, ...] | None = None):
    """Expand a (3,3,C,Co) SAME-conv kernel to (3,3,4C,4Co) operating on
    s2d tensors. With ``split``, the input side is re-indexed to accept
    ``cat(s2d(a), s2d(b), ...)`` where ``split`` are the original part
    widths (summing to C)."""
    kh, kw, c, co = k.shape
    assert kh == 3 and kw == 3, k.shape
    out = jnp.zeros((3, 3, 4 * c, 4 * co), k.dtype)
    for di in range(2):
        for dj in range(2):
            for du in range(3):
                for dv in range(3):
                    t, s = di + du - 1, dj + dv - 1
                    p, si = t // 2 + 1, t % 2
                    q, sj = s // 2 + 1, s % 2
                    gi, go = si * 2 + sj, di * 2 + dj
                    out = out.at[
                        p, q, gi * c : (gi + 1) * c, go * co : (go + 1) * co
                    ].set(k[du, dv])
    if split is not None:
        assert sum(split) == c, (split, c)
        out = jnp.take(out, jnp.asarray(_cat_perm(tuple(split))), axis=2)
    return out


def s2d_down_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Expand a (3,3,C,Co) SAME-conv kernel to the (4,4,C,4Co) stride-2
    kernel computing ``s2d(conv3x3(x))`` from the full-res input."""
    kh, kw, c, co = k.shape
    assert kh == 3 and kw == 3, k.shape
    out = jnp.zeros((4, 4, c, 4 * co), k.dtype)
    for di in range(2):
        for dj in range(2):
            go = di * 2 + dj
            for du in range(3):
                for dv in range(3):
                    out = out.at[
                        di + du, dj + dv, :, go * co : (go + 1) * co
                    ].set(k[du, dv])
    return out


def s2d_1x1_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Expand a (1,1,C,Co) kernel to the block-diagonal (1,1,4C,4Co)."""
    _, _, c, co = k.shape
    out = jnp.zeros((1, 1, 4 * c, 4 * co), k.dtype)
    for g in range(4):
        out = out.at[0, 0, g * c : (g + 1) * c, g * co : (g + 1) * co].set(
            k[0, 0]
        )
    return out


def tile_bias(b):
    """Per-channel bias for the 4 phase groups (group-major order)."""
    return None if b is None else jnp.tile(b, 4)


def conv_down_expanded(x, k4, bias4):
    """The conv core of :func:`conv_s2d_down` with the kernel ALREADY
    expanded (``s2d_down_kernel``) and the bias already tiled — the
    fallback form the int8 dispatcher can wrap (ops/quant.py
    ``conv_dispatch(strides=(2,2), padding=((1,1),(1,1)))``)."""
    dtype = jnp.promote_types(x.dtype, k4.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        k4.astype(dtype),
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias4 is not None:
        y = y + bias4.astype(dtype)
    return y


def conv_s2d_down(x, kernel, bias):
    """``s2d(conv3x3_SAME(x) [+ bias])`` as one stride-2 conv on the
    full-resolution input — the entry point into the s2d segment."""
    return conv_down_expanded(
        x, s2d_down_kernel(kernel), tile_bias(bias)
    )


def layer_norm_s2d(x, scale, bias, eps=1e-6):
    """Per-pixel channel LayerNorm over each of the 4 phase groups of an
    s2d tensor — ``nn.LayerNorm`` numerics per group (f32 fast-variance
    stats), reductions as block-diagonal dots to keep the conv layout
    (see DotLayerNorm)."""
    c4 = x.shape[-1]
    c = c4 // 4
    out_dtype = jnp.promote_types(x.dtype, scale.dtype)
    xf = x.astype(jnp.float32)
    avg = np.zeros((c4, c4), np.float32)
    for g in range(4):
        avg[g * c : (g + 1) * c, g * c : (g + 1) * c] = 1.0 / c
    avg = jnp.asarray(avg)
    dn = (((xf.ndim - 1,), (0,)), ((), ()))
    mean = jax.lax.dot_general(xf, avg, dn, precision="highest")
    m2 = jax.lax.dot_general(xf * xf, avg, dn, precision="highest")
    var = jnp.maximum(m2 - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * jnp.tile(scale, 4).astype(jnp.float32)
    y = (xf - mean) * mul + jnp.tile(bias, 4).astype(jnp.float32)
    return y.astype(out_dtype)
