"""Fused full-resolution decoder tail for BiDirectionalFusion (Pallas).

The last decoder stage of the V2 fusion head runs at full patch
resolution with small channel counts (98 -> 98 -> 32 -> 1): XLA executes
it as separate HBM-bound ops at 10-40% efficiency (xprof: the f2r_agg_4
DoubleConv convs + final_conv + clamp cost ~30 ms per 16-patch frame on
v5e while their FLOPs justify ~8 ms). This kernel keeps the whole chain
in VMEM: one read of the concatenated inputs, one write of (depth,
feat), with the three 3x3 convolutions as 9-tap MXU dot accumulations.

Semantics fused (reference fusion_model.py:7-35 UpSample +
bi_directional_fusion_model.py:441-446 final offset):

    d   = gelu(conv3x3_nobias(x, w0))       # DoubleConv Conv_0 (98ch)
    d   = gelu(conv3x3_nobias(d, w1))       # DoubleConv Conv_1 (32ch)
    off = conv3x3_nobias(d, wf)             # final_conv (1ch)
    out = max(update_base + off, 0)         # update clamp

Zero row/col padding propagates exactly through the chain because every
conv is bias-free and gelu(0) == 0 — so block-edge halos stitched from
neighbour row-blocks (or zeros at the tensor edge) reproduce SAME-pad
semantics bit-for-tolerance.

The bilinear upsample of the decoder feature and the channel concat stay
in XLA (they fuse well there; measured in round 1 that Pallas resizes
break producer fusions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_tanh(x):
    # matches models.blocks.convs.gelu for bf16 compute (tanh approx);
    # f32 path uses exact erf like flax
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _conv3x3(xpad, w, rows_out, w_out):
    """9-tap SAME conv on an NHWC VMEM block.

    xpad: (rows_out + 2, w_out + 2, cin) — already zero/halo padded.
    w: (3, 3, cin, cout). Accumulates in f32, returns (rows_out, w_out,
    cout) in f32."""
    cout = w.shape[-1]
    acc = jnp.zeros((rows_out, w_out, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = xpad[dy : dy + rows_out, dx : dx + w_out, :]
            # 3D dot (no reshape — collapsing unaligned dims stalls mosaic)
            acc = acc + jax.lax.dot_general(
                tile,
                w[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _tail_kernel(x_prev, x_cur, x_next, base_ref, w0_ref, w1_ref, wf_ref,
                 depth_ref, feat_ref, *, rows, width, n_blocks, relu_clamp):
    i = pl.program_id(1)
    cdt = x_cur.dtype

    cin = x_cur.shape[-1]
    # stitched, zero-padded input block: rows [iR-3, iR+R+3) x cols
    # [-3, W+3) — 3 halo each side feeds the three chained convs
    # (concatenate + pad, not .at[].set: scatter doesn't lower in mosaic)
    top = jnp.where(i > 0, x_prev[0, rows - 3 :, :, :], jnp.zeros_like(x_prev[0, :3]))
    bot = jnp.where(i < n_blocks - 1, x_next[0, :3, :, :], jnp.zeros_like(x_next[0, :3]))
    core = jnp.concatenate([top, x_cur[0], bot], axis=0)  # (rows+6, W, C)
    xbuf = jnp.pad(core, ((0, 0), (3, 3), (0, 0)))

    w0 = w0_ref[...]
    w1 = w1_ref[...]
    wf = wf_ref[...]
    h_total = n_blocks * rows

    def _edge_mask(y, row_off, col_off):
        """Zero out positions outside the true tensor: a conv output AT an
        out-of-tensor position is nonzero (it sees real edge data), but
        SAME-pad semantics require the NEXT conv to read zeros there.
        row_off/col_off: tensor coordinate of y's [0, 0] element."""
        ry, rx = y.shape[0], y.shape[1]
        # 3D iota directly — mosaic can't reshape a 2D mask to 3D
        row_g = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 0) + i * rows + row_off
        col_g = jax.lax.broadcasted_iota(jnp.int32, (ry, rx, 1), 1) + col_off
        ok = (row_g >= 0) & (row_g < h_total) & (col_g >= 0) & (col_g < width)
        return y * ok.astype(y.dtype)

    # conv1 over rows [-2, R+2) x cols [-2, W+2)
    y1 = _conv3x3(xbuf, w0.astype(cdt), rows + 4, width + 4)
    y1 = _edge_mask(_gelu_tanh(y1.astype(cdt)), -2, -2)
    # conv2 over rows [-1, R+1) x cols [-1, W+1)
    y2 = _conv3x3(y1, w1.astype(cdt), rows + 2, width + 2)
    y2 = _edge_mask(_gelu_tanh(y2.astype(cdt)), -1, -1)
    # final conv over rows [0, R) x cols [0, W)
    off = _conv3x3(y2, wf.astype(cdt), rows, width)

    feat_ref[0] = y2[1 : 1 + rows, 1 : 1 + width, :].astype(feat_ref.dtype)
    out = base_ref[0].astype(jnp.float32) + off
    if relu_clamp:
        out = jnp.maximum(out, 0.0)
    depth_ref[0] = out.astype(depth_ref.dtype)


def fused_decoder_tail(xcat, base, w0, w1, wf, relu_clamp=True,
                       interpret=None):
    """xcat: (B, H, W, Cin) concat of [upsampled decoder feature, level-0
    fusion feature, pred1, pred2]; base: (B, H, W, 1) update base (the
    roi'd coarse prediction). Returns (depth (B, H, W, 1), feat
    (B, H, W, Cout))."""
    b, h, w, cin = xcat.shape
    cout = w1.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # one neighbour block must supply the full 3-row halo, so row blocks
    # below 3 are unsupported (rows=2/1 would slice a short halo and crash
    # the jnp.where stitch)
    rows = next((r for r in (8, 6, 4, 3) if h % r == 0), None)
    if rows is None:
        raise ValueError(
            f"fused_decoder_tail: height {h} has no row-block divisor >= 3"
        )
    n_blocks = h // rows
    grid = (b, n_blocks)

    def imap(clamp_lo=False, clamp_hi=False):
        def f(bi, ri):
            if clamp_lo:
                ri = jnp.maximum(ri - 1, 0)
            if clamp_hi:
                ri = jnp.minimum(ri + 1, n_blocks - 1)
            return (bi, ri, 0, 0)
        return f

    kernel = functools.partial(
        _tail_kernel, rows=rows, width=w, n_blocks=n_blocks,
        relu_clamp=relu_clamp,
    )
    depth, feat = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, 1), jnp.result_type(base.dtype, xcat.dtype)),
            jax.ShapeDtypeStruct((b, h, w, cout), xcat.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows, w, cin), imap(clamp_lo=True)),
                pl.BlockSpec((1, rows, w, cin), imap()),
                pl.BlockSpec((1, rows, w, cin), imap(clamp_hi=True)),
                pl.BlockSpec((1, rows, w, 1), imap()),
                pl.BlockSpec(w0.shape, lambda bi, ri: (0, 0, 0, 0)),
                pl.BlockSpec(w1.shape, lambda bi, ri: (0, 0, 0, 0)),
                pl.BlockSpec(wf.shape, lambda bi, ri: (0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, rows, w, 1), imap()),
                pl.BlockSpec((1, rows, w, cout), imap()),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xcat, xcat, xcat, base, w0, w1, wf)
    return depth, feat
