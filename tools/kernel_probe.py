#!/usr/bin/env python
"""Standalone on-chip probe for the fused Pallas kernels.

Builds each fused op at the real m1 geometry (v2_eff: 384x512 patches,
process chunk of 4) with random bf16 inputs and runs it on the attached
TPU, comparing against interpret mode and timing it. This isolates
Mosaic/remote-compile failures from the full-model bench: a kernel that
fails here fails in bench.py for the same reason, but the probe turns
around in seconds instead of a full-model compile.

Usage:
    python tools/kernel_probe.py [--only gcu,f2r,c2f,pair,dc] [--n 4]
    python tools/kernel_probe.py --no-check        # skip interpret ref
"""

import argparse
import functools
import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _rand(key, shape, dtype=jnp.bfloat16, scale=0.5):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _time(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return out, (time.perf_counter() - t0) / iters * 1e3


def probe_gcu(n, check, mode="full", c=256, h=192, w=256):
    from patchrefinerv2_tpu.ops.fused_gcu import gated_conv_unit_fused

    # the hot C2F decoder GCU instance: 192x256x256 (see fused_gcu.py header)
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = _rand(ks[0], (n, h, w, c))
    p2b = _rand(ks[1], (n, h, w, c))
    k1 = _rand(ks[2], (3, 3, c, c), scale=0.05)
    b1 = _rand(ks[3], (c,), scale=0.1)
    k2a = _rand(ks[4], (3, 3, c, c), scale=0.05)
    b2 = _rand(ks[5], (c,), scale=0.1)
    lns = _rand(ks[6], (c,), scale=0.1) + 1.0
    lnb = _rand(ks[7], (c,), scale=0.1)
    k3 = _rand(ks[8], (c, c), scale=0.1)

    def run(interpret):
        return gated_conv_unit_fused(x, p2b, k1, b1, k2a, b2, lns, lnb, k3,
                                     gate=True, mode=mode, interpret=interpret)

    out, ms = _time(lambda: run(False))
    rel = None
    if check:
        ref = run(True)
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    return ms, rel


def probe_f2r(n, check):
    from patchrefinerv2_tpu.ops.fused_f2r import fused_f2r_supported, fused_f2r_tail

    h, w = 384, 512
    c0c, f0c, tc, in_mid, outc = 32, 32, 32, 64, 32
    midc = tc + in_mid + 2
    assert fused_f2r_supported((n, h, w, c0c), c0c, f0c, tc, midc, outc), \
        "supported() said no at the m1 geometry"
    ks = jax.random.split(jax.random.PRNGKey(1), 16)
    c0 = _rand(ks[0], (n, h, w, c0c))
    f0 = _rand(ks[1], (n, h, w, f0c))
    p1 = _rand(ks[2], (n, h, w, 1))
    p2 = _rand(ks[3], (n, h, w, 1))
    x1 = _rand(ks[4], (n, h, w, in_mid))
    base = jnp.abs(_rand(ks[5], (n, h, w, 1), scale=3.0))
    kA = _rand(ks[6], (3, 3, c0c + f0c, tc), scale=0.1)
    lnA = (_rand(ks[7], (tc,), scale=0.1) + 1.0, _rand(ks[8], (tc,), scale=0.1))
    kB = _rand(ks[9], (3, 3, tc + 2, tc), scale=0.1)
    lnB = (_rand(ks[10], (tc,), scale=0.1) + 1.0, _rand(ks[11], (tc,), scale=0.1))
    kC = _rand(ks[12], (3, 3, midc, midc), scale=0.05)
    kD = _rand(ks[13], (3, 3, midc, outc), scale=0.05)
    kE = _rand(ks[14], (3, 3, outc, 1), scale=0.05)

    def run(interpret):
        return fused_f2r_tail(c0, f0, p1, p2, x1, base, kA, lnA, kB, lnB,
                              kC, kD, kE, interpret=interpret)

    out, ms = _time(lambda: run(False))
    rel = None
    if check:
        ref = run(True)
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    return ms, rel


def probe_c2f(n, check):
    from patchrefinerv2_tpu.ops.fused_f2r import (
        fused_c2f_head,
        fused_c2f_head_supported,
    )

    h, w = 384, 512
    cp, cm, ct, cc = 256, 128, 32, 32
    assert fused_c2f_head_supported((n, h, w, cp), cm, ct, cc), \
        "supported() said no at the m1 geometry"
    ks = jax.random.split(jax.random.PRNGKey(2), 20)
    p1 = _rand(ks[0], (n, h, w, cp))
    c0 = _rand(ks[1], (n, h, w, cc))
    kO1 = _rand(ks[2], (3, 3, cp, cm), scale=0.05)
    bO1 = _rand(ks[3], (cm,), scale=0.1)
    kO2 = _rand(ks[4], (3, 3, cm, ct), scale=0.05)
    bO2 = _rand(ks[5], (ct,), scale=0.1)
    kG1 = _rand(ks[6], (3, 3, ct, ct), scale=0.1)
    bG1 = _rand(ks[7], (ct,), scale=0.1)
    kG2 = _rand(ks[8], (3, 3, ct + cc, ct), scale=0.1)
    bG2 = _rand(ks[9], (ct,), scale=0.1)
    lnG = (_rand(ks[10], (ct,), scale=0.1) + 1.0, _rand(ks[11], (ct,), scale=0.1))
    kG3 = _rand(ks[12], (1, 1, ct, ct), scale=0.1)
    kGF = _rand(ks[13], (1, 1, ct, ct), scale=0.1)
    bGF = _rand(ks[14], (ct,), scale=0.1)
    kO3 = _rand(ks[15], (1, 1, ct, 1), scale=0.1)
    bO3 = _rand(ks[16], (1,), scale=0.1)

    def run(interpret):
        return fused_c2f_head(p1, c0, kO1, bO1, kO2, bO2, kG1, bG1, kG2,
                              bG2, lnG, kG3, kGF, bGF, kO3, bO3,
                              interpret=interpret)

    (lf, out), ms = _time(lambda: run(False))
    rel = None
    if check:
        rlf, rout = run(True)
        rel = max(
            float(jnp.max(jnp.abs(lf.astype(jnp.float32) - rlf.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(rlf.astype(jnp.float32))) + 1e-9)),
            float(jnp.max(jnp.abs(out.astype(jnp.float32) - rout.astype(jnp.float32)))
                  / (jnp.max(jnp.abs(rout.astype(jnp.float32))) + 1e-9)),
        )
    return ms, rel


def probe_pair(n, check):
    from patchrefinerv2_tpu.ops.fused_f2r import fused_fusion_pair, fused_pair_supported

    # level-1 fusion pair: 192x256, coarse 64 + fine 64 -> temp 64
    h, w, cc, cf, tc = 192, 256, 64, 64, 64
    assert fused_pair_supported((n, h, w, cc), cf, tc), "supported() said no"
    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    c = _rand(ks[0], (n, h, w, cc))
    f = _rand(ks[1], (n, h, w, cf))
    p1 = _rand(ks[2], (n, h, w, 1))
    p2 = _rand(ks[3], (n, h, w, 1))
    kA = _rand(ks[4], (3, 3, cc + cf, tc), scale=0.05)
    lnA = (_rand(ks[5], (tc,), scale=0.1) + 1.0, _rand(ks[6], (tc,), scale=0.1))
    kB = _rand(ks[7], (3, 3, tc + 2, tc), scale=0.1)
    lnB = (_rand(ks[8], (tc,), scale=0.1) + 1.0, _rand(ks[9], (tc,), scale=0.1))

    def run(interpret):
        return fused_fusion_pair(c, f, p1, p2, kA, lnA, kB, lnB,
                                 interpret=interpret)

    out, ms = _time(lambda: run(False))
    rel = None
    if check:
        ref = run(True)
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    return ms, rel


def probe_dc(n, check):
    from patchrefinerv2_tpu.ops.fused_f2r import fused_dc_supported, fused_upsample_dc

    # the 192x256 decoder stage: x1up dec_chl[-3]=128, feat temp_chl[1]=64
    h, w, cx, ct = 192, 256, 128, 64
    midc, outc = cx + ct + 2, 64
    assert fused_dc_supported((n, h, w, cx), ct, outc), "supported() said no"
    ks = jax.random.split(jax.random.PRNGKey(4), 8)
    x1 = _rand(ks[0], (n, h, w, cx))
    f = _rand(ks[1], (n, h, w, ct))
    p1 = _rand(ks[2], (n, h, w, 1))
    p2 = _rand(ks[3], (n, h, w, 1))
    kC = _rand(ks[4], (3, 3, midc, midc), scale=0.05)
    kD = _rand(ks[5], (3, 3, midc, outc), scale=0.05)

    def run(interpret):
        return fused_upsample_dc(x1, f, p1, p2, kC, kD, interpret=interpret)

    out, ms = _time(lambda: run(False))
    rel = None
    if check:
        ref = run(True)
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    return ms, rel


PROBES = {
    "gcu": probe_gcu,
    "f2r": probe_f2r,
    "c2f": probe_c2f,
    "pair": probe_pair,
    "dc": probe_dc,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=",".join(PROBES))
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--gcu-mode", default="full", choices=["full", "tail"])
    args = ap.parse_args()
    PROBES["gcu"] = functools.partial(probe_gcu, mode=args.gcu_mode)

    import os
    os.environ.setdefault("PRV2_FUSED_FORCE", "1")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    results = {}
    rc = 0
    for name in args.only.split(","):
        name = name.strip()
        if not name:
            continue
        t0 = time.perf_counter()
        try:
            ms, rel = PROBES[name](args.n, not args.no_check)
            results[name] = {"ms": round(ms, 3), "max_rel": rel}
            print(f"[{name}] OK  {ms:.3f} ms/call  max_rel={rel}  "
                  f"(wall {time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe must survive any kernel failure
            rc = 1
            line = f"{type(e).__name__}: {e}".splitlines()[0][:300]
            results[name] = {"error": line}
            print(f"[{name}] FAIL {line}", flush=True)
            if "--trace" in sys.argv:
                traceback.print_exc()
    print(json.dumps(results))
    return rc


if __name__ == "__main__":
    sys.exit(main())
