"""torchvision-exact ``roi_align(aligned=True)`` as a vmapped JAX gather kernel.

This is the load-bearing custom op of PatchRefinerV2: per-patch aligned crops
of whole-image coarse features/prediction at each pyramid level
(reference: estimator/models/patchrefinerplus.py:243-276,
patchrefiner.py:191-210, patchfusion.py:237-255). Semantics replicated:

* ``aligned=True``: continuous roi coords = box * spatial_scale - 0.5,
* bin size = roi_size / out_size; ``sampling_ratio`` grid points per bin,
  averaged. torchvision's adaptive ratio is ``ceil(roi/out)`` which is
  always 1 at every reference call site (roi covers at most the whole
  feature map, out_size == feature size), so the static default of 1 is
  exact there; other static ratios are supported for generality.
* bilinear sampling with torchvision's border rule: points with
  y < -1 or y > H contribute 0, otherwise coords clamp into [0, H-1].

Layout: features NHWC, boxes are (N, 4) ``[x1, y1, x2, y2]`` paired with an
(N,) int batch index (the reference packs the index as column 0; we keep it a
separate argument — cleaner for vmap/jit).

Golden-tested against a pure-numpy port of the torchvision CPU algorithm
(tests/test_roi_align.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["roi_align"]


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at continuous coords y, x (each shape S) with
    torchvision border semantics. Returns (S, C)."""
    h, w, _ = feat.shape
    valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    yc = jnp.clip(y, 0.0, h - 1.0)
    xc = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (yc - y0.astype(yc.dtype))[:, None]
    lx = (xc - x0.astype(xc.dtype))[:, None]
    hy = 1.0 - ly
    hx = 1.0 - lx
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(valid[:, None], out, 0.0)


def _axis_weights(starts, bins, out_size, in_size, dtype):
    """Per-roi separable interpolation matrix (P, out, in).

    For sampling_ratio=1 the RoI-Align sample grid is separable:
    y_i = y1 + (i + 0.5) * bin_h. Each output row is a 2-tap bilinear
    combination of input rows -> expressed as a dense one-hot-weighted
    matrix so the whole roi_align becomes two batched matmuls on the MXU
    instead of millions of gathers (the TPU-native formulation; gathers
    were the inference bottleneck).
    """
    P = starts.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)
    coords = starts[:, None] + (i[None, :] + 0.5) * bins[:, None]  # (P, out)
    valid = (coords >= -1.0) & (coords <= in_size)
    cc = jnp.clip(coords, 0.0, in_size - 1.0)
    c0 = jnp.floor(cc)
    frac = cc - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, in_size - 1)
    lo = jax.nn.one_hot(c0i, in_size, dtype=jnp.float32) * (1.0 - frac)[..., None]
    hi = jax.nn.one_hot(c1i, in_size, dtype=jnp.float32) * frac[..., None]
    w = (lo + hi) * valid[..., None].astype(jnp.float32)
    return w.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio")
)
def roi_align_mxu(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    output_size: tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
) -> jnp.ndarray:
    """Separable-matmul RoI-Align (exact for sampling_ratio=1 — every
    reference call site). Same semantics as :func:`roi_align`."""
    assert sampling_ratio == 1, "MXU path covers the sampling_ratio=1 case"
    out_h, out_w = output_size
    B, H, W, C = features.shape
    dtype = features.dtype
    cdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    boxes = boxes.astype(jnp.float32)
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    wh = _axis_weights(y1, (y2 - y1) / out_h, out_h, H, cdt)  # (P, out_h, H)
    ww = _axis_weights(x1, (x2 - x1) / out_w, out_w, W, cdt)  # (P, out_w, W)

    feats = features.astype(cdt)
    # f32 inputs demand exact accumulation (TPU default matmul precision is
    # bf16 passes); bf16 inputs keep the fast path with f32 accumulation
    kw = (
        {"preferred_element_type": jnp.float32}
        if cdt == jnp.bfloat16
        else {"precision": "highest"}
    )

    def one(whi, wwi, idx):
        f = feats[idx]  # (H, W, C)
        t = jnp.einsum("ih,hwc->iwc", whi, f, **kw)
        t = t.astype(cdt)
        return jnp.einsum("jw,iwc->ijc", wwi, t, **kw)

    out = jax.vmap(one)(wh, ww, box_indices.astype(jnp.int32))
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_gather(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    output_size: tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
) -> jnp.ndarray:
    """Aligned RoI-Align.

    Args:
      features: (B, H, W, C) feature map.
      boxes: (N, 4) float [x1, y1, x2, y2] in input coordinates.
      box_indices: (N,) int32 batch index per box.
      output_size: (out_h, out_w).
      spatial_scale: multiplied into box coords to map to feature coords.
      sampling_ratio: static grid points per bin edge (>=1).

    Returns:
      (N, out_h, out_w, C).
    """
    out_h, out_w = output_size
    s = sampling_ratio
    feat_dtype = features.dtype
    features = features.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)

    def one_roi(box, b_idx):
        feat = features[b_idx]
        x1 = box[0] * spatial_scale - 0.5
        y1 = box[1] * spatial_scale - 0.5
        x2 = box[2] * spatial_scale - 0.5
        y2 = box[3] * spatial_scale - 0.5
        bin_h = (y2 - y1) / out_h
        bin_w = (x2 - x1) / out_w
        # sample grid: for bin i, points y1 + (i + (k+0.5)/s) * bin_h
        iy = jnp.arange(out_h * s, dtype=jnp.float32)
        ix = jnp.arange(out_w * s, dtype=jnp.float32)
        ys = y1 + ((jnp.floor(iy / s)) + ((iy % s) + 0.5) / s) * bin_h
        xs = x1 + ((jnp.floor(ix / s)) + ((ix % s) + 0.5) / s) * bin_w
        yy = jnp.repeat(ys, out_w * s)
        xx = jnp.tile(xs, out_h * s)
        samples = _bilinear_gather(feat, yy, xx)  # (out_h*s*out_w*s, C)
        samples = samples.reshape(out_h, s, out_w, s, -1)
        return samples.mean(axis=(1, 3))

    out = jax.vmap(one_roi)(boxes, box_indices.astype(jnp.int32))
    return out.astype(feat_dtype)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    output_size: tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
) -> jnp.ndarray:
    """Public entry: MXU separable path for sampling_ratio=1 (all reference
    call sites), gather path otherwise."""
    if sampling_ratio == 1:
        return roi_align_mxu(
            features, boxes, box_indices, output_size, spatial_scale, sampling_ratio
        )
    return roi_align_gather(
        features, boxes, box_indices, output_size, spatial_scale, sampling_ratio
    )
