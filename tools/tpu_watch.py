#!/usr/bin/env python
"""Wait for the TPU backend to become reachable, then run the per-flag
bench matrix (tools/bench_matrix.py) for the requested modes.

The axon TPU relay intermittently drops; backend init then HANGS rather
than erroring, so every probe runs in a bounded subprocess. Results land
in bench_matrix_<mode>.json at the repo root, which bench.py's auto mode
consumes — so a successful watch run directly improves the driver's
end-of-round measurement.

Usage:
    python tools/tpu_watch.py [--modes m1,r32] [--interval 300] [--max-wait 14400]
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128,128), jnp.bfloat16);"
    "print('devok', (x@x).sum(), jax.devices())"
)


def probe(timeout):
    env = {k: v for k, v in os.environ.items() if not k.startswith("PRV2_")}
    try:
        p = subprocess.run([sys.executable, "-c", PROBE], capture_output=True,
                           text=True, timeout=timeout, env=env)
        return p.returncode == 0 and "devok" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="m1")
    ap.add_argument("--interval", type=int, default=300)
    ap.add_argument("--probe-timeout", type=int, default=240)
    ap.add_argument("--max-wait", type=int, default=14400)
    ap.add_argument("--matrix-args", default="")
    args = ap.parse_args()

    t0 = time.time()
    n = 0
    while time.time() - t0 < args.max_wait:
        n += 1
        if probe(args.probe_timeout):
            print(f"[tpu_watch] backend up after {time.time()-t0:.0f}s "
                  f"({n} probes)", flush=True)
            break
        print(f"[tpu_watch] probe {n} failed ({time.time()-t0:.0f}s)", flush=True)
        time.sleep(args.interval)
    else:
        print("[tpu_watch] gave up: backend never came up", flush=True)
        return 1

    rc = 0
    for mode in args.modes.split(","):
        cmd = [sys.executable, os.path.join(ROOT, "tools", "bench_matrix.py"),
               "--mode", mode.strip()] + (args.matrix_args.split() if args.matrix_args else [])
        print("[tpu_watch] run:", " ".join(cmd), flush=True)
        rc = max(rc, subprocess.run(cmd).returncode)
    return rc


if __name__ == "__main__":
    sys.exit(main())
