#!/usr/bin/env python
"""Training-step throughput on the real chip (flagship V2 recipe).

Measures img/s/chip for the reference training recipe (bs=4/device,
AdamW + OneCycle + clip, remat — docs/user_training.md:72,
configs/_base_/datasets/u4k.py) at f32 and/or bf16 compute
(`train_dtype`), so the mixed-precision lever has an on-chip number.

Usage:
    python tools/bench_train.py [--bs 4] [--steps 10] [--warmup 3] \
        [--dtypes float32,bfloat16] [--no-remat]

Prints one JSON line per dtype:
    {"metric": "train img/s/chip bs=4 remat", "dtype": ..., "value": ...}
"""

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prv2_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    import optax

    from bench import flagship_config, _wait_for_backend
    from patchrefinerv2_tpu.registry import MODELS
    from patchrefinerv2_tpu.training.optim import build_optimizer

    _wait_for_backend()
    jax.devices()

    rng = np.random.RandomState(0)
    bs = args.bs
    # the reference train crop pipeline: 384x512 lr + 540x960 crops resized
    # to the patch process shape (u4k_dataset.py:186-204)
    batch = {
        "image_lr": jnp.asarray(rng.rand(bs, 384, 512, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(bs, 384, 512, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(bs, 384, 512, 1), jnp.float32),
        "bboxs": jnp.asarray(
            np.tile([[64.0, 48.0, 192.0, 144.0]], (bs, 1)), jnp.float32
        ),
    }

    for dtype in filter(None, args.dtypes.split(",")):
        cfg = flagship_config()
        cfg["remat"] = not args.no_remat
        cfg["train_dtype"] = dtype
        cfg.pop("infer_dtype", None)
        model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg))
        variables = model.init(jax.random.PRNGKey(0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats")

        tx, _ = build_optimizer(
            dict(
                optimizer=dict(type="AdamW", lr=1.2e-4, weight_decay=0.01),
                clip_grad=dict(max_norm=35),
                paramwise_cfg=dict(custom_keys={
                    "refiner_fine_branch.refiner_encoder": dict(lr_mult=0.1),
                    "coarse_branch": dict(lr_mult=0.1),
                }),
            ),
            dict(cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                 div_factor=2, final_div_factor=100, pct_start=0.3),
            total_steps=1000,
            params=params,
            frozen_prefixes=(("coarse",),),
        )
        opt_state = tx.init(params)

        # donate the train state: without donation, back-to-back async
        # dispatch keeps every in-flight step's input AND output state
        # alive (~7 GB each), which OOM'd the chip while the host kept
        # enqueueing — the loop then timed ~17 ms ENQUEUES, not steps
        # (round-4 postmortem; the 22.1 TFLOP / 459 GB step measured by
        # compile().cost_analysis() bounds a real step at >= ~560 ms).
        # Block every step: train steps are long enough that dispatch
        # latency is noise, and a poisoned buffer must surface here.
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, batch, key):
            def loss_fn(p):
                v = {"params": p, "batch_stats": batch_stats}
                ld, aux = model.loss(v, batch, rng=key, mutable=["batch_stats"])
                return ld["total_loss"], aux["variables"]["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # barrier scalar: depends on EVERY updated leaf, so fetching it
            # on the host forces the whole step (one extra ~1.4 GB reduce,
            # ~2 ms). On the tunneled backend block_until_ready is
            # per-buffer-readiness and returns long before the program
            # finishes (measured 61 ms "steps" on a >=560 ms program);
            # only a host fetch of a late-produced value is a real barrier.
            chk = sum(
                jnp.sum(p.astype(jnp.float32))
                for p in jax.tree_util.tree_leaves(new_params)
            ) + loss
            return new_params, new_bs, new_opt, loss, chk

        key = jax.random.PRNGKey(0)
        for _ in range(args.warmup):
            params, batch_stats, opt_state, loss, chk = step(
                params, batch_stats, opt_state, batch, key
            )
            float(chk)  # host fetch = real barrier (see step docstring)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, batch_stats, opt_state, loss, chk = step(
                params, batch_stats, opt_state, batch, key
            )
            float(chk)
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({
            "metric": f"train img/s/chip bs={bs}"
                      + ("" if args.no_remat else " remat"),
            "dtype": dtype,
            "step_ms": round(dt * 1e3, 1),
            "value": round(bs / dt, 3),
        }), flush=True)
        assert np.isfinite(float(loss)), f"non-finite loss at {dtype}"


if __name__ == "__main__":
    main()
