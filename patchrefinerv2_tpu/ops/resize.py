"""Image resize with exact PyTorch ``F.interpolate`` semantics, as matmuls.

The reference leans on torch's resize everywhere (tile crops, pyramid-level
feature alignment, loss-side up/down-sampling), with ``align_corners=True``
bilinear being the dominant mode (e.g. estimator/models/blocks/
bi_directional_fusion_model.py:393,421-422, external/zoedepth/models/base_
models/midas.py:171-174). ``jax.image.resize`` has different edge semantics,
so we build explicit 1-D interpolation weight matrices (numpy, host-side,
cached per (in, out, mode, align_corners)) and apply them as two tensor
contractions. On TPU this maps onto the MXU and fuses with surrounding ops —
faster and exactly reproducible.

Layout: NHWC (TPU-native). ``resize_nchw_like_torch`` exists only for golden
tests against torch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_matrix", "resize_nchw_like_torch"]

@functools.lru_cache(maxsize=None)
def _resize_matrix_np(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    scale_override: float | None = None,
) -> np.ndarray:
    """Rows = output pixels, cols = input pixels; row @ input = output."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == out_size and mode != "nearest":
        # identity for matching sizes (torch shortcuts this case too)
        np.fill_diagonal(w, 1.0)
        return w.astype(np.float32)

    # torch computes source coordinates in float32 for float inputs; mirror
    # that exactly (otherwise weights drift by ~5e-5 at large indices)
    dst = np.arange(out_size, dtype=np.float32)

    if mode == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        scale = np.float32(in_size / out_size)
        src_idx = np.floor(dst * scale).astype(np.int64)
        src_idx = np.clip(src_idx, 0, in_size - 1)
        w[np.arange(out_size), src_idx] = 1.0
        return w.astype(np.float32)

    if align_corners:
        scale = np.float32((in_size - 1) / (out_size - 1)) if out_size > 1 else np.float32(0.0)
        src = (dst * scale).astype(np.float32)
    else:
        # torch uses 1/scale_factor when the caller passed scale_factor=
        # (recompute_scale_factor=False), else in/out
        scale = np.float32(1.0 / scale_override) if scale_override else np.float32(in_size / out_size)
        src = ((dst + np.float32(0.5)) * scale - np.float32(0.5)).astype(np.float32)
        if mode != "bicubic":
            # torch clamps the source index at 0 for linear modes but not cubic
            src = np.maximum(src, np.float32(0.0))
    src = src.astype(np.float64)

    if mode == "bilinear" or mode == "linear":
        lo = np.floor(src).astype(np.int64)
        lo = np.clip(lo, 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = src - lo
        for i in range(out_size):
            w[i, lo[i]] += 1.0 - frac[i]
            w[i, hi[i]] += frac[i]
    elif mode == "bicubic":
        # cubic convolution, A=-0.75 (PyTorch/OpenCV constant), clamped taps
        A = -0.75

        def cubic(t: np.ndarray) -> np.ndarray:
            at = np.abs(t)
            r = np.where(
                at <= 1.0,
                ((A + 2.0) * at - (A + 3.0)) * at * at + 1.0,
                np.where(
                    at < 2.0,
                    (((at - 5.0) * at + 8.0) * at - 4.0) * A,
                    0.0,
                ),
            )
            return r

        base = np.floor(src).astype(np.int64)
        frac = src - base
        for tap in range(-1, 3):
            idx = np.clip(base + tap, 0, in_size - 1)
            coef = cubic(tap - frac)
            for i in range(out_size):
                w[i, idx[i]] += coef[i]
    else:
        raise ValueError(f"unsupported resize mode {mode!r}")

    return w.astype(np.float32)


def resize_matrix(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    scale_override: float | None = None,
):
    return _resize_matrix_np(in_size, out_size, mode, bool(align_corners), scale_override)


@functools.lru_cache(maxsize=256)
def _axis_tap_plan(in_size, out_size, mode, align_corners, scale_override):
    """Decompose one resize axis into <=2 static taps per output index and,
    when sizes are exact integer multiples, into a set of (offset -> static
    weight vector) terms over shifted repeats / strided slices.

    Returns None when the axis has >2 taps (bicubic), a non-integer ratio,
    or needs too many offsets — caller falls back to the dense matmul.
    """
    W = _resize_matrix_np(in_size, out_size, mode, bool(align_corners), scale_override)
    idx0 = np.zeros(out_size, np.int64)
    idx1 = np.zeros(out_size, np.int64)
    w0 = np.zeros(out_size, np.float32)
    w1 = np.zeros(out_size, np.float32)
    for p in range(out_size):
        nz = np.nonzero(W[p])[0]
        if len(nz) == 0 or len(nz) > 2:
            return None
        idx0[p] = nz[0]
        w0[p] = W[p, nz[0]]
        idx1[p] = nz[-1]
        if len(nz) == 2:
            w1[p] = W[p, nz[1]]
    if out_size % in_size == 0:
        k = out_size // in_size
        base = np.arange(out_size) // k
        kind = "up"
    elif in_size % out_size == 0:
        k = in_size // out_size
        base = np.arange(out_size) * k
        kind = "down"
    else:
        return None
    offs: dict[int, np.ndarray] = {}
    for idx, w in ((idx0, w0), (idx1, w1)):
        g_arr = idx - base
        for g in np.unique(g_arr):
            m = np.where(g_arr == g, w, 0.0).astype(np.float32)
            offs[int(g)] = offs.get(int(g), 0.0) + m
    offs = {g: w for g, w in offs.items() if np.any(w)}
    if len(offs) > 6:
        return None
    return kind, k, tuple(sorted(offs.items()))


def _shift_axis(x, axis, g, length):
    """y[i] = x[clip(i+g)] along ``axis`` (edge padded; masked by weights)."""
    if g == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if g > 0:
        pad[axis] = (0, g)
        xp = jnp.pad(x, pad, mode="edge")
        return jax.lax.slice_in_dim(xp, g, g + length, axis=axis)
    pad[axis] = (-g, 0)
    xp = jnp.pad(x, pad, mode="edge")
    return jax.lax.slice_in_dim(xp, 0, length, axis=axis)


def _resize_axis_fast(x, axis, out_size, mode, align_corners, scale_override):
    """Integer-factor axis resize as static-weighted shifted copies.

    Every pyramid interp in the fusion/DPT stacks is a x2-family resize; a
    dense resize matmul there does ~in_size/2 times the needed FLOPs and
    forces XLA layout copies around each dot (profiled at 25% of inference).
    This path is elementwise (VPU), layout-preserving, and exact: each
    output element receives exactly its <=2 bilinear taps.
    """
    in_size = x.shape[axis]
    plan = _axis_tap_plan(in_size, int(out_size), mode, bool(align_corners), scale_override)
    if plan is None:
        return None
    kind, k, offs = plan
    out = None
    bshape = [1] * x.ndim
    bshape[axis] = int(out_size)
    for g, w in offs:
        if kind == "up":
            shifted = _shift_axis(x, axis, g, in_size)
            rep = jnp.repeat(shifted, k, axis=axis)
        else:
            pad_hi = max(0, (out_size - 1) * k + g + 1 - in_size)
            pad_lo = max(0, -g)
            xp = x
            if pad_lo or pad_hi:
                pad = [(0, 0)] * x.ndim
                pad[axis] = (pad_lo, pad_hi)
                xp = jnp.pad(x, pad, mode="edge")
            start = g + pad_lo
            rep = jax.lax.slice_in_dim(
                xp, start, start + (out_size - 1) * k + 1, stride=k, axis=axis
            )
        wv = jnp.asarray(np.asarray(w), x.dtype).reshape(bshape)
        term = rep * wv
        out = term if out is None else out + term
    return out


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    scale_override: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NHW1-style) array to ``size=(H, W)``.

    Matches ``torch.nn.functional.interpolate(x_nchw, size, mode,
    align_corners)`` numerically (golden-tested in tests/test_resize.py).
    Integer-factor bilinear/nearest axes take the shifted-copy fast path
    (:func:`_resize_axis_fast`); other shapes use the dense-matrix MXU path.
    """
    if x.ndim == 3:  # HWC
        return resize(x[None], size, mode, align_corners, scale_override)[0]
    if x.ndim != 4:
        raise ValueError(f"expected NHWC, got shape {x.shape}")
    n, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (h, w) == (out_h, out_w) and mode != "nearest" and scale_override is None:
        return x
    dtype = x.dtype
    sh, sw = scale_override if scale_override else (None, None)

    compute_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    y = x.astype(compute_dtype)

    for axis, out_size, s in ((1, out_h, sh), (2, out_w, sw)):
        if y.shape[axis] == out_size and mode != "nearest" and s is None:
            continue
        # NOTE: a shifted-copy decomposition of integer-factor 2-tap resizes
        # (see _resize_axis_fast) was profiled on v5e and LOSES to the dense
        # matmul here — XLA materializes the broadcast/repeat terms (~35 ms
        # of broadcasts per m1 frame) while the MXU absorbs the dense dot.
        # Kept for host-side use and as the building block for a future
        # pallas fusion; the jit path always uses the matmul.
        wm = jnp.asarray(resize_matrix(y.shape[axis], out_size, mode, align_corners, s))
        if compute_dtype == jnp.bfloat16:
            # emit bf16 directly: the MXU accumulates in f32 regardless, and
            # asking for an f32 result materializes a full-res f32 tensor +
            # a convert_element_type pass (profiled at 7.5 ms/frame on the
            # refinenet1 full-res upsample alone)
            wm = wm.astype(jnp.bfloat16)
            spec = "oh,nhwc->nowc" if axis == 1 else "pw,nowc->nopc"
            y = jnp.einsum(spec, wm, y, preferred_element_type=jnp.bfloat16)
        else:
            spec = "oh,nhwc->nowc" if axis == 1 else "pw,nowc->nopc"
            y = jnp.einsum(spec, wm, y, precision="highest")
    return y.astype(dtype)


def resize_nchw_like_torch(x, size, mode="bilinear", align_corners=False):
    """NCHW wrapper used by golden tests to compare against torch directly."""
    y = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    y = resize(y, size, mode, align_corners)
    return jnp.transpose(y, (0, 3, 1, 2))
