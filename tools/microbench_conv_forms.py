#!/usr/bin/env python
"""Conv-formulation microbench: lax.conv vs 9-shifted-matmul accumulation.

Motivation (docs/performance.md): the fusion head is ~74% of an m1 frame
and its 3x3 convs run at ~44-55% MXU in bf16; the int8 path only bought
+4-5% end-to-end even though int8 MATMULS microbench at ~300 TOP/s —
because XLA's int8 CONV lowering measures only ~187 TOP/s (and bf16 conv
~100-165 TF/s vs 165+ TF/s matmul). A SAME 3x3 conv is algebraically
sum_{dy,dx} shift(x, dy, dx) @ K[dy, dx] — nine (NHW, Cin) x (Cin, Cout)
matmuls accumulated in place, which keeps the MXU on its fast matmul
path at the cost of re-reading x nine times (fully hidden if the HBM
time of 9 reads < matmul FLOP time, which holds at Cin >= 256 int8).

This measures, per hot geometry:
  conv.bf16        — baseline lax conv (f32 acc, bf16 out)
  conv.int8        — lax conv int8 -> i32, dequant f32 -> bf16 (current
                     ops/quant.py path)
  mm9.bf16         — 9-shifted-matmul bf16 (f32 acc)
  mm9.int8         — 9-shifted-matmul int8 -> i32, dequant -> bf16
  mm9.int8.bf16deq — same but the dequant multiplies in bf16

Each timed fn feeds its output through a cheap dependency so the tunnel
can't elide work. Small graphs -> seconds-scale compiles, so this is the
cheap way to choose a formulation before paying a full-model compile.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

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


def mm9(x, k, acc_dtype):
    """SAME 3x3 conv as 9 shifted matmuls accumulated in acc_dtype.

    x: (N, H, W, Cin); k: (3, 3, Cin, Cout). Zero-pad H/W by 1 and take
    nine (N, H, W, Cin) windows; each contracts with its (Cin, Cout) tap.
    """
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                xp, (0, dy, dx, 0), (n, dy + h, dx + w, xp.shape[-1])
            )
            term = jax.lax.dot_general(
                win, k[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            acc = term if acc is None else acc + term
    return acc


def bench_geometry(rng, n, h, w, cin, cout):
    flops = 2 * n * h * w * cin * cout * 9
    print(f"\n== {n}x{h}x{w}x{cin} -> {cout} ({flops/1e12:.2f} TFLOP) ==")

    x_bf = jnp.asarray(rng.randn(n, h, w, cin), jnp.bfloat16)
    k_bf = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    sc = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
    x_i8 = jnp.asarray(rng.randint(-127, 128, (n, h, w, cin)), jnp.int8)
    k_i8 = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)

    t = timeit(lambda x, k: conv(x, k, jnp.float32).astype(jnp.bfloat16), x_bf, k_bf)
    print(f"conv.bf16        : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TF/s")

    t = timeit(
        lambda x, k: (conv(x, k, jnp.int32).astype(jnp.float32) * sc).astype(jnp.bfloat16),
        x_i8, k_i8)
    print(f"conv.int8        : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s")

    t = timeit(lambda x, k: mm9(x, k, jnp.float32).astype(jnp.bfloat16), x_bf, k_bf)
    print(f"mm9.bf16         : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TF/s")

    t = timeit(
        lambda x, k: (mm9(x, k, jnp.int32).astype(jnp.float32) * sc).astype(jnp.bfloat16),
        x_i8, k_i8)
    print(f"mm9.int8         : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s")

    t = timeit(
        lambda x, k: (mm9(x, k, jnp.int32).astype(jnp.bfloat16)
                      * sc.astype(jnp.bfloat16)),
        x_i8, k_i8)
    print(f"mm9.int8.bf16deq : {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TOP/s")


def main():
    rng = np.random.RandomState(0)
    # refinenet1 GatedConvUnit Conv_0 and Conv_1 (the two biggest single
    # ops of the m1 profile), and the full-res output_conv1
    bench_geometry(rng, 16, 192, 256, 256, 256)
    bench_geometry(rng, 16, 192, 256, 512, 256)
    bench_geometry(rng, 16, 384, 512, 256, 128)


if __name__ == "__main__":
    main()
