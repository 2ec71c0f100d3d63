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
    wh = jnp.asarray(resize_matrix(h, out_h, mode, align_corners, sh))
    ww = jnp.asarray(resize_matrix(w, out_w, mode, align_corners, sw))
    if dtype == jnp.bfloat16:
        # keep the MXU in bf16 with f32 accumulation
        y = x
        wh = wh.astype(jnp.bfloat16)
        ww = ww.astype(jnp.bfloat16)
        y = jnp.einsum("oh,nhwc->nowc", wh, y, preferred_element_type=jnp.float32)
        y = y.astype(jnp.bfloat16)
        y = jnp.einsum("pw,nowc->nopc", ww, y, preferred_element_type=jnp.float32)
        return y.astype(dtype)
    y = x.astype(jnp.float32)
    # contract H: (out_h,h) x (n,h,w,c) -> (n,out_h,w,c)
    y = jnp.einsum("oh,nhwc->nowc", wh, y, precision="highest")
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision="highest")
    return y.astype(dtype)


def resize_nchw_like_torch(x, size, mode="bilinear", align_corners=False):
    """NCHW wrapper used by golden tests to compare against torch directly."""
    y = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    y = resize(y, size, mode, align_corners)
    return jnp.transpose(y, (0, 3, 1, 2))
