"""Pallas TPU kernel: fused 2-axis bilinear resize for NHWC feature maps.

Torch ``F.interpolate(mode='bilinear')`` (no antialias) reads exactly two
taps per axis regardless of scale. The dense-matmul formulation in
``ops/resize.py`` is exact but makes XLA materialize layout copies around
every dot (profiled at ~62 ms / 17 GB per m1 frame, clustered on the
fusion/DPT pyramid upsamples — the reference hits the same ops through
torch's native CUDA kernel, e.g. external/depth_anything/blocks.py:146 and
estimator/models/blocks/bi_directional_fusion_model.py:421-422).

This kernel keeps the NHWC layout end-to-end:

* grid = (N, OH/BH, OW/BW); the output block lives in VMEM and is
  pipelined by pallas_call;
* the input stays in HBM (``pl.ANY``) and each program DMAs only the row
  band its output block reads (row starts are host-precomputed and passed
  via scalar prefetch);
* the column interpolation runs as one small in-VMEM MXU matmul per input
  row (weights are the exact resize-matrix rows);
* the row interpolation is a 2-tap VPU pass using host-precomputed
  (index, fraction) tables.

Numerics match the dense path: same f32 accumulation per axis, same
per-axis cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchrefinerv2_tpu.ops.resize import resize_matrix

__all__ = ["bilinear_resize_pallas", "pallas_resize_supported"]


def _largest_divisor_leq(n: int, cap: int) -> int:
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.lru_cache(maxsize=None)
def _row_plan(in_size: int, out_size: int, align_corners: bool, block: int):
    """Host tables for the 2-tap row stage.

    Returns (bh_out, bh_in, rstart (nb,), lo_local (nb, bh_out),
    frac (nb, bh_out)) with lo clamped to [0, in-2] and the fraction
    adjusted so ``(1-f)*x[lo] + f*x[lo+1]`` is exact at the edges.
    """
    W = resize_matrix(in_size, out_size, "bilinear", align_corners)
    lo = np.zeros(out_size, np.int64)
    frac = np.zeros(out_size, np.float32)
    for p in range(out_size):
        nz = np.nonzero(W[p])[0]
        lo_p = int(nz[0])
        if lo_p >= in_size - 1 and in_size > 1:
            lo_p = in_size - 2
        lo[p] = lo_p
        # weight on tap lo+1
        frac[p] = W[p, lo_p + 1] if lo_p + 1 < in_size else 0.0
        if len(nz) == 1 and nz[0] == lo_p:  # pure copy of lo
            frac[p] = 0.0
        elif len(nz) == 1 and nz[0] == lo_p + 1:
            frac[p] = 1.0
    bh_out = _largest_divisor_leq(out_size, block)
    nb = out_size // bh_out
    spans = []
    for b in range(nb):
        sl = lo[b * bh_out : (b + 1) * bh_out]
        spans.append(int(sl[-1]) + 2 - int(sl[0]))
    bh_in = min(max(spans), in_size)
    rstart = np.zeros(nb, np.int32)
    lo_local = np.zeros((nb, bh_out), np.int32)
    for b in range(nb):
        rs = min(int(lo[b * bh_out]), in_size - bh_in)
        rstart[b] = rs
        lo_local[b] = lo[b * bh_out : (b + 1) * bh_out] - rs
    return bh_out, bh_in, rstart, lo_local, frac.reshape(nb, bh_out)


_VMEM_BUDGET = 9 * 1024 * 1024


def _pick_blocks(h, w, c, oh, ow, itemsize):
    """Pick (bh_out, bh_in_bound, bw_out) so x-band + mid + double-buffered
    out block fit the scoped-VMEM budget. Returns None if impossible."""
    for bw_cap in (256, 128, 64, 32, 16, 8):
        bw_out = _largest_divisor_leq(ow, bw_cap)
        for bh_cap in (32, 16, 8, 4, 2, 1):
            bh_out = _largest_divisor_leq(oh, bh_cap)
            bh_in = min(int(np.ceil((bh_out - 1) * max((h - 1) / max(oh - 1, 1), 1.0))) + 2, h)
            # 2x row band (double-buffered DMA) + mid + double-buffered out
            need = itemsize * (
                2 * bh_in * w * c + bh_in * bw_out * c + 2 * bh_out * bw_out * c
            )
            if need < _VMEM_BUDGET:
                return bh_out, bw_out
    return None


def pallas_resize_supported(
    in_shape: tuple[int, ...],
    size: tuple[int, int],
    mode: str,
    itemsize: int = 2,
) -> bool:
    """Heuristic gate: worth it only for channel-heavy feature maps where
    the row-band VMEM footprint stays comfortably on-chip."""
    if mode != "bilinear" or len(in_shape) != 4:
        return False
    n, h, w, c = in_shape
    oh, ow = size
    if h < 2 or w < 2 or oh < 2 or ow < 2:
        return False
    # Mosaic requires the (un-tiled) lane dim of a DMA'd slice to align to
    # the 128-lane register width
    if c < 128 or c % 128 or c > 1024:
        return False
    if w > 1024 or ow > 1024:
        return False
    return _pick_blocks(h, w, c, oh, ow, itemsize) is not None


@functools.lru_cache(maxsize=None)
def _build_kernel(
    n: int,
    h: int,
    w: int,
    c: int,
    oh: int,
    ow: int,
    align_corners: bool,
    dtype_name: str,
    interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    blocks = _pick_blocks(h, w, c, oh, ow, dtype.itemsize)
    if blocks is None:
        raise ValueError("shape does not fit the pallas resize VMEM budget")
    bh_cap, bw_out = blocks
    bh_out, bh_in, rstart, lo_local, frac = _row_plan(h, oh, align_corners, bh_cap)
    n_hb = oh // bh_out
    n_wb = ow // bw_out
    wcol_full = resize_matrix(w, ow, "bilinear", align_corners)  # (ow, w)
    # host numpy only — the cached closure must not hold traced jnp values
    # (jnp.asarray inside a jit trace would leak tracers across traces);
    # each trace lifts these as constants. bf16 inputs use bf16 weights on
    # the MXU, matching the dense path.
    wcol_np = np.ascontiguousarray(wcol_full.reshape(n_wb, bw_out, w))
    rstart_np = np.ascontiguousarray(rstart)
    lo_np = np.ascontiguousarray(lo_local)
    frac_np = np.ascontiguousarray(frac)

    def kernel(rstart_ref, lo_ref, frac_ref, x_ref, wcol_ref, out_ref, x_vmem, mid, sem):
        # grid is (n, hb, wb) with wb minor: each (n, hb) row band is DMA'd
        # ONCE into a double-buffered scratch slot and reused across all wb
        # column blocks, with the next band prefetched while this one is
        # consumed (otherwise each program stalls on its own DMA).
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        # slot parity follows the LINEAR band index (ni*n_hb + hi): with an
        # odd n_hb, a per-hi parity would collide at batch boundaries
        band_lin = ni * n_hb + hi
        slot = jax.lax.rem(band_lin, 2)

        def band_dma(band_ni, band_hi, band_slot):
            rs = rstart_ref[band_hi]
            return pltpu.make_async_copy(
                x_ref.at[band_ni, pl.ds(rs, bh_in)],
                x_vmem.at[band_slot],
                sem.at[band_slot],
            )

        @pl.when(wi == 0)
        def _():
            @pl.when(jnp.logical_and(ni == 0, hi == 0))
            def _():
                band_dma(ni, hi, slot).start()

            band_dma(ni, hi, slot).wait()

            lin = band_lin + 1

            @pl.when(lin < n * n_hb)
            def _():
                nxt_ni = lin // n_hb
                nxt_hi = jax.lax.rem(lin, n_hb)
                band_dma(nxt_ni, nxt_hi, jax.lax.rem(lin, 2)).start()

        wc = wcol_ref[0]  # (bw_out, w)

        # the environment's default matmul precision is reduced; f32 inputs
        # must request full-precision passes to match the dense resize path
        prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

        def col_dot(hrow, _):
            seg = x_vmem[slot, hrow]  # (w, c)
            mid[hrow] = jnp.dot(
                wc, seg, preferred_element_type=jnp.float32, precision=prec
            ).astype(dtype)
            return _

        jax.lax.fori_loop(0, bh_in, col_dot, None)

        def row_tap(r, _):
            lo = lo_ref[hi, r]
            f = frac_ref[hi, r]
            a = mid[lo].astype(jnp.float32)
            b = mid[lo + 1].astype(jnp.float32)
            out_ref[0, r] = ((1.0 - f) * a + f * b).astype(dtype)
            return _

        jax.lax.fori_loop(0, bh_out, row_tap, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, bw_out, w),
                lambda ni, hi, wi, *_: (wi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh_out, bw_out, c),
            lambda ni, hi, wi, *_: (ni, hi, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh_in, w, c), dtype),
            pltpu.VMEM((bh_in, bw_out, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * ow * w * c // max(n_wb, 1) + 4 * n * oh * ow * c,
            bytes_accessed=(n * h * w * c + n * oh * ow * c) * dtype.itemsize,
            transcendentals=0,
        ),
    )

    def run(x):
        return call(
            jnp.asarray(rstart_np),
            jnp.asarray(lo_np),
            jnp.asarray(frac_np),
            x,
            jnp.asarray(wcol_np, dtype),
        )

    return run


def bilinear_resize_pallas(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Exact torch-bilinear NHWC resize as one fused Pallas program.

    Caller must check :func:`pallas_resize_supported` first. Falls back to
    interpreter mode off-TPU so golden tests run on CPU.
    """
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    # 'axon' is the tunneled single-TPU platform in this environment
    interpret = jax.default_backend() not in ("tpu", "axon")
    run = _build_kernel(
        n, h, w, c, oh, ow, bool(align_corners), jnp.dtype(x.dtype).name, interpret
    )
    return run(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def bilinear_resize_fused(x, size, align_corners=True):
    """Differentiable wrapper: Pallas forward, dense-matmul transpose
    backward (training batches are small patches; the kernel only needs to
    win on the inference hot path)."""
    return bilinear_resize_pallas(x, size, align_corners)


def _fused_fwd(x, size, align_corners):
    return bilinear_resize_pallas(x, size, align_corners), x.shape


def _fused_bwd(size, align_corners, in_shape, g):
    n, h, w, c = in_shape
    oh, ow = int(size[0]), int(size[1])
    dtype = g.dtype
    compute = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    y = g.astype(compute)
    for axis, in_size, out_size in ((1, h, oh), (2, w, ow)):
        wm = jnp.asarray(
            resize_matrix(in_size, out_size, "bilinear", align_corners), compute
        )
        spec = "oh,nowc->nhwc" if axis == 1 else "pw,nhpc->nhwc"
        kw = (
            {"preferred_element_type": jnp.float32}
            if compute == jnp.bfloat16
            else {"precision": jax.lax.Precision.HIGHEST}
        )
        y = jnp.einsum(spec, wm, y, **kw).astype(compute)
    return (y.astype(dtype),)


bilinear_resize_fused.defvjp(_fused_fwd, _fused_bwd)
