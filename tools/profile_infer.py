#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship tiled-inference program.

Usage: python tools/profile_infer.py [outdir] (env: BENCH_CAI_MODE,
BENCH_PROCESS_NUM, PRV2_INT8; PRV2_INT8=static additionally calibrates
per-site activation scales on the profile input first, so the trace shows
the PTQ serving graph, not the dynamic-reduction one). Writes an xplane
trace consumable by tensorboard_plugin_profile / xprof for op-level
breakdowns.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prv2_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patchrefinerv2_tpu.registry import MODELS  # noqa: E402
from bench import flagship_config  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prv2_trace"
    cai_mode = os.environ.get("BENCH_CAI_MODE", "m1")
    process_num = int(os.environ.get("BENCH_PROCESS_NUM", "16"))

    model = MODELS.build(dict(type="PatchRefinerPlus", config=flagship_config()))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image_lr = jnp.asarray(rng.rand(1, 384, 512, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 2160, 3840, 3), jnp.float32)
    seed = jax.random.PRNGKey(0)

    if os.environ.get("PRV2_INT8", "") == "static":
        os.environ["PRV2_INT8"] = "1"
        variables = model.calibrate_int8(
            variables, [(image_lr, image_hr)], process_num=process_num
        )
        print("calibrated static int8 scales", flush=True)

    def once():
        d, _ = model.infer(
            variables, image_lr, image_hr,
            cai_mode=cai_mode, process_num=process_num, seed=seed,
        )
        jax.block_until_ready(d)

    once()  # compile
    once()
    with jax.profiler.trace(outdir):
        once()
        once()
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
