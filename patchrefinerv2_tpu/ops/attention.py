"""Attention ops: exact XLA softmax attention + a Pallas flash kernel.

The reference ViT blocks use plain softmax attention (the xformers
memory-efficient path falls back to it: external/depth_anything_v2/
dinov2_layers/attention.py:49-61). ``mha_reference`` reproduces those
numerics with XLA einsums (MXU-tiled, fused by the compiler) and is the
ground truth path.

``flash_mha`` is a Pallas TPU online-softmax kernel with a full Pallas
backward (flash-attention-2 style): the forward also emits the per-row
logsumexp; the backward recomputes the probability blocks from (q, k,
lse) instead of materializing the (S, S) matrix — O(S) memory in both
directions, so long-sequence training never allocates attention
matrices. Sequences are padded to the block size; padded key columns are
masked with -inf before the online softmax so the result matches the
exact path bit-for-tolerance, and padded rows/columns are re-masked in
the backward kernels so their gradients are exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_reference", "flash_mha", "mha"]

_NEG_INF = -1e30


def mha_reference(q, k, v, scale: float | None = None):
    """q, k, v: (B, H, S, D). Exact softmax attention; matmuls run in the
    input dtype (bf16 on TPU MXU) with float32 accumulation, softmax in
    float32."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return o.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                  *, scale, kv_len, block_kv, bias_ref=None):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0].astype(jnp.float32)  # (bk, d)
    v = v_ref[0].astype(jnp.float32)  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if bias_ref is not None:
        # additive attention bias (e.g. BEiT relative-position bias),
        # added before the padded-column mask overrides it
        s = s + bias_ref[0].astype(jnp.float32)

    # mask padded kv columns (static kv_len)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, scale, block_q, block_kv, interpret, bias=None):
    """Returns (out (B,H,Sq,D), lse (B*H, Sq_padded, 1) float32).

    ``bias``: optional additive attention bias (H, Sq, Skv), shared over
    the batch (the BEiT relative-position-bias shape)."""
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]

    qp = _pad_to(q.reshape(b * h, s_q, d), block_q, 1)
    kp = _pad_to(k.reshape(b * h, s_kv, d), block_kv, 1)
    vp = _pad_to(v.reshape(b * h, s_kv, d), block_kv, 1)
    sq_p, skv_p = qp.shape[1], kp.shape[1]

    grid = (b * h, sq_p // block_q, skv_p // block_kv)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, i, j: (bh, j, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, i, j: (bh, j, 0)),
    ]
    args = [qp, kp, vp]
    if bias is None:
        kernel = functools.partial(
            _flash_kernel, scale=scale, kv_len=s_kv, block_kv=block_kv
        )
    else:
        bp = _pad_to(_pad_to(bias, block_q, 1), block_kv, 2)

        def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, m_s, l_s, a_s):
            _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, a_s,
                          scale=scale, kv_len=s_kv, block_kv=block_kv,
                          bias_ref=b_ref)

        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_kv),
                lambda bh, i, j: (jax.lax.rem(bh, h), i, j),
            )
        )
        args.append(bp)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
                pl.BlockSpec((1, block_q, 1), lambda bh, i, j: (bh, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out[:, :s_q].reshape(b, h, s_q, d), lse


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr, *, scale, q_len, kv_len, block_q,
                         block_kv):
    """grid (bh, q_idx, kv_idx): accumulate dq over kv blocks.

    ds = p * (do v^T - delta); dq = scale * ds k.
    """
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    p = jnp.where(col < kv_len, jnp.exp(s - lse), 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    ds = p * (dp - delta)
    dq_scr[:] += scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *, scale, q_len,
                          kv_len, block_q, block_kv):
    """grid (bh, kv_idx, q_idx): accumulate dk/dv over q blocks.

    dv = p^T do; dk = scale * ds^T q. Padded q rows are masked so they
    contribute exactly zero (their lse/delta entries are garbage).
    """
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    kv_idx = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
    p = jnp.where((col < kv_len) & (row < q_len), jnp.exp(s - lse), 0.0)

    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    ds = p * (dp - delta)
    dk_scr[:] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, d)

    @pl.when(q_idx == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, scale, block_q, block_kv, interpret):
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]

    qp = _pad_to(q.reshape(b * h, s_q, d), block_q, 1)
    kp = _pad_to(k.reshape(b * h, s_kv, d), block_kv, 1)
    vp = _pad_to(v.reshape(b * h, s_kv, d), block_kv, 1)
    dop = _pad_to(g.reshape(b * h, s_q, d), block_q, 1)
    sq_p, skv_p = qp.shape[1], kp.shape[1]

    # delta_i = sum_d dO_i O_i — tiny elementwise reduce, leave it to XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(b * h, s_q, 1)
    delta = _pad_to(delta, block_q, 1)

    in_specs_q = [  # (bh, q_idx, kv_idx)
        pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, i, j: (bh, j, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, i, j: (bh, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, i, j: (bh, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, i, j: (bh, i, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, q_len=s_q, kv_len=s_kv,
            block_q=block_q, block_kv=block_kv,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b * h, sq_p // block_q, skv_p // block_kv),
            in_specs=in_specs_q,
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    in_specs_kv = [  # (bh, kv_idx, q_idx)
        pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, j, i: (bh, j, 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, j, i: (bh, j, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, j, i: (bh, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, q_len=s_q, kv_len=s_kv,
            block_q=block_q, block_kv=block_kv,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, skv_p, d), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b * h, skv_p // block_kv, sq_p // block_q),
            in_specs=in_specs_kv,
            out_specs=[
                pl.BlockSpec((1, block_kv, d), lambda bh, j, i: (bh, j, 0)),
                pl.BlockSpec((1, block_kv, d), lambda bh, j, i: (bh, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d), jnp.float32),
                pltpu.VMEM((block_kv, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    dq = dq[:, :s_q].reshape(b, h, s_q, d)
    dk = dk[:, :s_kv].reshape(b, h, s_kv, d)
    dv = dv[:, :s_kv].reshape(b, h, s_kv, d)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7))
def flash_mha(q, k, v, scale=None, bias=None, block_q=256, block_kv=256,
              interpret=False):
    """Flash attention. q, k, v: (B, H, S, D); optional additive ``bias``
    (H, Sq, Skv) shared over batch (BEiT relative-position bias). The bias
    path is forward-only (no VJP) — inference use."""
    d = q.shape[-1]
    s = scale if scale is not None else d**-0.5
    out, _ = _flash_forward(q, k, v, s, block_q, block_kv, interpret, bias)
    return out


def _flash_fwd(q, k, v, scale, bias, block_q, block_kv, interpret):
    d = q.shape[-1]
    s = scale if scale is not None else d**-0.5
    out, lse = _flash_forward(q, k, v, s, block_q, block_kv, interpret, bias)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(scale, block_q, block_kv, interpret, res, g):
    q, k, v, bias, o, lse = res
    if bias is not None:
        raise NotImplementedError(
            "flash_mha backward with an attention bias is not implemented "
            "(the bias path is inference-only; train with use_flash off)"
        )
    d = q.shape[-1]
    s = scale if scale is not None else d**-0.5
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, s, block_q, block_kv,
                                 interpret)
    return dq, dk, dv, None


flash_mha.defvjp(_flash_fwd, _flash_bwd)


def mha(q, k, v, scale=None, use_flash=False, interpret=False, bias=None):
    if use_flash:
        return flash_mha(q, k, v, scale, bias=bias, interpret=interpret)
    o = mha_reference(q, k, v, scale) if bias is None else None
    if bias is not None:
        d = q.shape[-1]
        sc = scale if scale is not None else d**-0.5
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q * jnp.asarray(sc, q.dtype), k,
            preferred_element_type=jnp.float32,
        ) + bias[None].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    return o
