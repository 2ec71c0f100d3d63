"""Exact XLA softmax attention.

The reference ViT blocks use plain softmax attention (the xformers
memory-efficient path falls back to it: external/depth_anything_v2/
dinov2_layers/attention.py:49-61). ``mha`` reproduces those numerics with
XLA einsums — MXU-tiled and fused by the compiler, with f32 accumulation
and f32 softmax.

A Pallas flash-attention kernel (online softmax, O(S) memory, full Pallas
backward, per-block additive bias) lived here through rounds 2-3. It was
block-swept on the real chip at the flagship BEiT-L geometry (S=769,
D=64, H=16) and measured BELOW this exact path end-to-end (m1 3.87 vs
4.04 fps): at S~1e3 both S^2 matrices fit in VMEM, so XLA's fused exact
attention is already memory-optimal and the online-softmax bookkeeping is
pure overhead. Removed 2026-08-19 (round 3) per the measured A/B —
recoverable from git history; see docs/performance.md "Retired kernels".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mha_reference", "mha"]


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


def mha(q, k, v, scale=None, bias=None):
    """Exact attention with an optional additive (H, S, S) bias (the BEiT
    relative-position-bias form); bias-free calls share mha_reference."""
    if bias is None:
        return mha_reference(q, k, v, scale)
    d = q.shape[-1]
    sc = scale if scale is not None else d**-0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * jnp.asarray(sc, q.dtype), k,
        preferred_element_type=jnp.float32,
    ) + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
