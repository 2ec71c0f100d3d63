#!/usr/bin/env python
"""Calibrate static int8 activation scales for a trained model (PTQ).

Runs the tiled-inference patch pipeline over N calibration frames with
``PRV2_INT8_CALIB=1`` (every quant-eligible conv sows its activation
abs-max — ops/quant.py), folds the observations, and writes a checkpoint
whose variables carry the resulting ``quant_scales`` collection. Serving
that checkpoint with ``PRV2_INT8=1`` quantizes against the calibrated
grid instead of paying a dynamic per-conv abs-max reduction (measured
-13% end-to-end, docs/performance.md).

    python tools/calibrate_int8.py CONFIG --ckp-path CKPT --out OUTDIR \\
        [--frames 8] [--process-num 16] [--cfg-option k.k2=v ...]

Frames come from the config's val/test dataloader when one is buildable,
else random frames at the config geometry (scales from random inputs are
only for throughput experiments — calibrate on real frames for accuracy).
No reference counterpart (the reference has no quantized inference).
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckp-path", default=None)
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--process-num", type=int, default=16)
    ap.add_argument("--cfg-option", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from patchrefinerv2_tpu.config import Config
    from patchrefinerv2_tpu.registry import MODELS, build_dataset
    from patchrefinerv2_tpu.utils.checkpoint import (
        apply_config_pretrained,
        load_checkpoint,
        merge_pretrained,
        save_checkpoint,
    )

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_option)

    model = MODELS.build(cfg["model"])
    variables = model.init(jax.random.PRNGKey(0))
    variables = apply_config_pretrained(model, variables)
    if args.ckp_path:
        ckpt = load_checkpoint(args.ckp_path)
        state = ckpt.get("model_state_dict", ckpt)
        variables = dict(variables, params=merge_pretrained(
            variables["params"], state.get("params", state)))

    frames = []
    for loader_key in ("val_dataloader", "test_dataloader", "general_dataloader"):
        if loader_key not in cfg:
            continue
        try:
            ds = build_dataset(cfg[loader_key]["dataset"])
        except Exception as e:  # dataset not materializable in this env
            print(f"{loader_key} unavailable ({e}); trying next", file=sys.stderr)
            continue
        for i in range(min(args.frames, len(ds))):
            item = ds[i]
            frames.append((
                jnp.asarray(np.asarray(item["image_lr"])[None]),
                jnp.asarray(np.asarray(item["image_hr"])[None]),
            ))
        if frames:
            print(f"calibrating on {len(frames)} frames from {loader_key}",
                  file=sys.stderr)
            break
    if not frames:
        h, w = model.tile_cfg.image_raw_shape
        lh, lw = model.patch_process_shape
        rng = np.random.RandomState(0)
        frames = [
            (jnp.asarray(rng.rand(1, lh, lw, 3), jnp.float32),
             jnp.asarray(rng.rand(1, h, w, 3), jnp.float32))
            for _ in range(max(1, args.frames // 4))
        ]
        print(f"no dataset available; calibrating on {len(frames)} random "
              "frames (throughput-only scales)", file=sys.stderr)

    variables = model.calibrate_int8(
        variables, frames, process_num=args.process_num)
    n = len(jax.tree_util.tree_leaves(variables["quant_scales"]))
    print(f"calibrated {n} conv sites", file=sys.stderr)

    save_checkpoint(args.out, {"model_state_dict": variables})
    print(f"wrote calibrated checkpoint to {args.out}")


if __name__ == "__main__":
    main()
