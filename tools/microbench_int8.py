#!/usr/bin/env python
"""Int8-vs-bf16 MXU feasibility microbench (one real chip).

The single-chip r32 roofline at the flagship graph's ~100 TFLOP/frame is
~2 fps at the v5e bf16 peak (~197 TF/s) — the 5 fps/chip target is
unreachable in bf16 no matter the utilization (docs/performance.md). The
only single-chip route past it is int8 (v5e ~394 TOPS). Before building a
quantized inference path, measure whether XLA actually lowers int8 convs
at the flagship hot shapes to MXU rate (and doesn't detour through the
VPU): if conv_int8 ~2x conv_bf16 here, the path is worth building.

Each timed op feeds its output back through a cheap dependency so the
tunnel can't elide work (docs/performance.md microbench rule).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# the profiled hot site: GatedConvUnit 3x3 convs at 192x256x256 over a
# 16-patch chunk (docs/performance.md xprof breakdown)
N, H, W, C = 16, 192, 256, 256
MM = 8192  # sanity-matmul side
ITERS = 30


def timeit(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn_j(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS


def conv(x, k, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def main():
    rng = np.random.RandomState(0)
    flops = 2 * N * H * W * C * C * 9

    x_bf = jnp.asarray(rng.randn(N, H, W, C), jnp.bfloat16)
    k_bf = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    t_bf = timeit(lambda x, k: conv(x, k, jnp.float32).astype(jnp.bfloat16), x_bf, k_bf)
    print(f"conv bf16->f32acc : {t_bf*1e3:8.3f} ms  {flops/t_bf/1e12:7.1f} TF/s")

    x_i8 = jnp.asarray(rng.randint(-127, 128, (N, H, W, C)), jnp.int8)
    k_i8 = jnp.asarray(rng.randint(-127, 128, (3, 3, C, C)), jnp.int8)
    t_i8 = timeit(lambda x, k: conv(x, k, jnp.int32).astype(jnp.int8), x_i8, k_i8)
    print(f"conv int8->i32acc : {t_i8*1e3:8.3f} ms  {flops/t_i8/1e12:7.1f} TOP/s")

    # int8 conv + dequant-rescale to bf16 (what a quantized layer would do)
    sc = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    t_i8d = timeit(
        lambda x, k: (conv(x, k, jnp.int32).astype(jnp.float32) * sc).astype(jnp.bfloat16),
        x_i8, k_i8)
    print(f"conv int8+dequant : {t_i8d*1e3:8.3f} ms  {flops/t_i8d/1e12:7.1f} TOP/s")

    # MXU sanity ceiling: plain big matmuls
    a = jnp.asarray(rng.randn(MM, MM), jnp.bfloat16)
    t_mm = timeit(lambda a: (a @ a).astype(jnp.bfloat16), a)
    print(f"matmul bf16 {MM}^3: {t_mm*1e3:8.3f} ms  {2*MM**3/t_mm/1e12:7.1f} TF/s")
    ai = jnp.asarray(rng.randint(-127, 128, (MM, MM)), jnp.int8)
    t_mi = timeit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.int32).astype(jnp.int8), ai)
    print(f"matmul int8 {MM}^3: {t_mi*1e3:8.3f} ms  {2*MM**3/t_mi/1e12:7.1f} TOP/s")

    print(f"\nconv int8 speedup vs bf16: {t_bf/t_i8d:.2f}x (with dequant)")


if __name__ == "__main__":
    main()
