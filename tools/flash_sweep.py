#!/usr/bin/env python
"""On-chip block-size sweep for flash_mha at the real BEiT-L geometry.

B=1 image, H=16 heads, S=769 tokens (384x512/16^2 + cls), D=64, plus the
(H, S, S) Toeplitz relative-position bias resident in HBM — the exact
shape the coarse forward runs per frame (models/backbones/beit.py).

Each timed iteration feeds its output back in as q (dependency chain), so
the axon tunnel cannot elide work (docs/performance.md measurement note).
Compares against the XLA exact path (mha_reference + bias, as the model
runs it when PRV2_FLASH_BEIT is off).

Usage: python tools/flash_sweep.py [--iters 30]
"""

import argparse
import itertools
import time

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.ops.attention import flash_mha, mha_reference

B, H, S, D = 1, 16, 769, 64


def _chain(fn, q0, iters):
    q = q0
    t0 = time.perf_counter()
    for _ in range(iters):
        q = fn(q)
    jax.block_until_ready(q)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32).astype(jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, S, S), jnp.float32) * 0.1
    scale = D**-0.5

    @jax.jit
    def xla_step(qq):
        s = jnp.einsum("bhqd,bhkd->bhqk", qq * jnp.asarray(scale, qq.dtype), k,
                       preferred_element_type=jnp.float32)
        s = s + bias[None].astype(s.dtype)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(qq.dtype)

    ref = xla_step(q)
    t_xla = _chain(xla_step, q, args.iters)
    print(f"xla exact+bias: {t_xla:.3f} ms/iter", flush=True)

    for bq, bkv in itertools.product((128, 256, 512), (128, 256, 512)):
        try:
            f = jax.jit(lambda qq, bq=bq, bkv=bkv: flash_mha(
                qq, k, v, scale, bias=bias, block_q=bq, block_kv=bkv))
            out = f(q)
            rel = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = _chain(f, q, args.iters)
            mark = " <== beats XLA" if t < t_xla else ""
            print(f"flash bq={bq:4d} bkv={bkv:4d}: {t:.3f} ms/iter "
                  f"maxdiff={rel:.4f}{mark}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive bad configs
            print(f"flash bq={bq:4d} bkv={bkv:4d}: FAIL "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
