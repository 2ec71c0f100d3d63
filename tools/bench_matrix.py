#!/usr/bin/env python
"""Per-flag A/B matrix on the real chip.

Runs ``bench.py`` in bounded subprocesses — baseline (all experiment
flags off), then each flag variant — and prints a delta table so a
measurement session attributes wins/regressions to individual flags.
Each variant gets its own subprocess: a compile failure or a relay hang
costs that variant its timeout, never the session. The persistent JAX
compilation cache (bench.py sets JAX_COMPILATION_CACHE_DIR) makes
repeats cheap.

The measured variant set (VARIANTS below) covers the round-5 serving
defaults and their ablations: int8 modes (perchan/static/dynamic), the
s2d layout tail, and the int8 gates (s2d sites, spatial, KC threshold,
accuracy-rejected tail family). The round-2/3 fused-Pallas-kernel flag
family this harness was built for is retired (docs/performance.md
"Retired kernels").

Usage:
    python tools/bench_matrix.py [--mode m1] [--iters 10] [--timeout 2400]
    python tools/bench_matrix.py --mode r32 --only BENCH_INT8=perchan
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# experiment variants: BENCH_* keys go straight into the subprocess env
# (bench.py reads them at startup); other keys ride BENCH_FLAGS and are
# exported at trace time. Each entry is (label, [(key, value), ...]) —
# the int8 GATE ablations must ride on top of an int8 mode (against the
# pure-bf16 baseline they would just re-measure bf16).
VARIANTS = [
    ("int8[perchan] (the default)", [("BENCH_INT8", "perchan")]),
    ("int8[static]", [("BENCH_INT8", "static")]),
    ("int8[dynamic]", [("BENCH_INT8", "1")]),
    ("s2d tail OFF", [("PRV2_S2D", "0")]),
    ("int8 minus s2d sites",
     [("BENCH_INT8", "perchan"), ("PRV2_INT8_S2D", "0")]),
    ("int8 no spatial gate",
     [("BENCH_INT8", "perchan"), ("PRV2_INT8_MIN_HW", "0")]),
    ("int8 round-4 KC gate",
     [("BENCH_INT8", "perchan"), ("PRV2_INT8_MIN_KC", "2048")]),
    # accuracy-rejected: quantize the full-res s2d tail too ("-" = skip
    # no family; an empty value would be rewritten to "1" by the
    # BENCH_FLAGS parser)
    ("int8 incl tail (accuracy-rejected)",
     [("BENCH_INT8", "perchan"), ("PRV2_INT8_SKIP", "-")]),
]


def run_variant(name, flag_pairs, mode, iters, warmup, timeout):
    direct = {k: v for k, v in flag_pairs if k.startswith("BENCH_")}
    spec = ",".join(f"{k}={v}" for k, v in flag_pairs if not k.startswith("BENCH_"))
    # strip inherited PRV2_*/BENCH_INT8 flags so an exported flag from an
    # earlier manual session can't contaminate every variant's delta
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PRV2_") and k != "BENCH_INT8"}
    env.update(
        BENCH_CAI_MODE=mode,
        BENCH_ITERS=str(iters),
        BENCH_WARMUP=str(warmup),
        BENCH_FLAGS=spec,
    )
    # bench.py's DEFAULT mode is int8[static] (round 4); the matrix
    # baseline stays pure bf16 so every int8 variant's delta is
    # attributed against it. Set the default BEFORE merging `direct`:
    # passing BENCH_INT8 both as a keyword and inside **direct raises
    # TypeError for the int8 variants.
    env["BENCH_INT8"] = "0"
    env.update(direct)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return name, None, "timeout"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        # newest-JAX tracebacks end with a "removed its internal frames"
        # note; the actual exception line sits above it — search backwards
        # for something that looks like `SomeError: ...`
        err = None
        for line in reversed(tail):
            s = line.strip()
            if ":" in s and s.split(":", 1)[0].replace(".", "").isidentifier() \
                    and ("Error" in s.split(":", 1)[0] or "Exception" in s.split(":", 1)[0]):
                err = s[:300]
                break
        if err is None:
            err = tail[-1][:300] if tail else f"rc={proc.returncode}"
        return name, None, err
    for line in proc.stdout.splitlines():
        try:
            rec = json.loads(line)
            return name, rec["value"], ""
        except (ValueError, KeyError):
            continue
    return name, None, "no JSON line"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="m1", help="cai mode (m1 is the cheap proxy)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=2400, help="per-variant bound, s")
    ap.add_argument("--only", default=None,
                    help="comma list K=V: measure baseline + exactly this combo")
    ap.add_argument("--skip-singles", action="store_true",
                    help="only baseline + all-on")
    args = ap.parse_args()

    variants = [("baseline (pure bf16)", [])]
    if args.only:
        pairs = []
        for p in args.only.split(","):
            k, _, v = p.partition("=")
            pairs.append((k.strip(), v.strip() or "1"))
        variants.append((args.only, pairs))
    elif not args.skip_singles:
        variants += list(VARIANTS)

    results = []
    base_fps = None
    out_path = os.path.join(ROOT, f"bench_matrix_{args.mode}.json")

    def measure(name, pairs):
        nonlocal base_fps
        name, fps, err = run_variant(
            name, pairs, args.mode, args.iters, args.warmup, args.timeout)
        if fps is not None and base_fps is None and name.startswith("baseline"):
            base_fps = fps
        delta = "" if fps is None or not base_fps else f"{(fps/base_fps-1)*100:+.1f}%"
        line = f"{name:40s} {fps if fps is not None else 'FAIL':>10} {delta:>8} {err}"
        print(line, flush=True)
        results.append({"variant": name, "mode": args.mode, "fps": fps,
                        "error": err or None, "flags": dict(pairs)})
        # write after every variant: a killed session keeps what it measured
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        return fps

    for name, pairs in variants:
        measure(name, pairs)


if __name__ == "__main__":
    main()
