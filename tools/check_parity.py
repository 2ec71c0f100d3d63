#!/usr/bin/env python
"""Depth-parity harness: converted reference checkpoint vs this framework.

The build target (BASELINE.md) is <=1e-3 relative depth error vs the
PyTorch reference. This tool runs the half of that comparison this
framework controls: load a converted checkpoint, run the coarse branch
(or full tiled inference) on given images, and dump depth .npy files
plus summary stats. Compare against reference dumps produced by running
the PyTorch repo on the same inputs:

    # torch side (reference repo):  save metric_depth as .npy per image
    # jax side:
    python tools/check_parity.py CONFIG --ckp-path CONVERTED_CKPT \
        --images img1.png img2.png --out /tmp/parity_jax
    # then:
    python tools/check_parity.py --compare /tmp/parity_jax /tmp/parity_torch

Zero-egress note: pretrained checkpoints are not available in this build
environment; the harness is validated with random weights (shapes/IO) and
the converters are numerically pinned by the torch-parity tests
(tests/test_*_torch_parity.py).
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(dir_a: str, dir_b: str) -> int:
    files_a = {os.path.basename(p): p for p in glob.glob(os.path.join(dir_a, "*.npy"))}
    files_b = {os.path.basename(p): p for p in glob.glob(os.path.join(dir_b, "*.npy"))}
    common = sorted(set(files_a) & set(files_b))
    if not common:
        print("no common .npy files to compare")
        return 1
    worst = 0.0
    for name in common:
        a = np.load(files_a[name]).astype(np.float64).squeeze()
        b = np.load(files_b[name]).astype(np.float64).squeeze()
        if a.shape != b.shape:
            print(f"{name}: SHAPE MISMATCH {a.shape} vs {b.shape}")
            worst = np.inf
            continue
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-6)
        print(
            f"{name}: rel max={rel.max():.2e} mean={rel.mean():.2e} "
            f"p99={np.percentile(rel, 99):.2e}"
        )
        worst = max(worst, float(np.percentile(rel, 99)))
    ok = worst <= 1e-3
    print(f"p99 relative error {worst:.2e} -> {'PASS' if ok else 'FAIL'} (target 1e-3)")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?")
    p.add_argument("--ckp-path", default=None)
    p.add_argument("--images", nargs="+", default=None)
    p.add_argument("--out", default="/tmp/parity_jax")
    p.add_argument("--cai-mode", default="m1")
    p.add_argument("--process-num", type=int, default=4)
    p.add_argument("--coarse-only", action="store_true",
                   help="dump only the coarse branch prediction at 384x512")
    p.add_argument("--compare", nargs=2, metavar=("DIR_A", "DIR_B"), default=None)
    args = p.parse_args()

    if args.compare:
        sys.exit(compare(*args.compare))

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from patchrefinerv2_tpu.config import Config
    from patchrefinerv2_tpu.registry import build_model
    from patchrefinerv2_tpu.utils.checkpoint import load_checkpoint, merge_pretrained
    from patchrefinerv2_tpu.datasets.transforms import resize_hwc

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0))
    if args.ckp_path:
        ckpt = load_checkpoint(args.ckp_path)
        variables = dict(
            variables, params=merge_pretrained(variables["params"], ckpt["params"])
        )
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]

    os.makedirs(args.out, exist_ok=True)
    lr_shape = tuple(model.patch_process_shape)
    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        image_lr = jnp.asarray(resize_hwc(img, lr_shape))[None]
        name = os.path.splitext(os.path.basename(path))[0]
        if args.coarse_only:
            net = model.net
            _, pred = net.apply(
                variables, image_lr, method=type(net).coarse_forward
            )
            depth = np.asarray(pred)[0, :, :, 0]
        else:
            image_hr = jnp.asarray(img)[None]
            tile = {
                "image_raw_shape": list(img.shape[:2]),
                "patch_split_num": list(model.tile_cfg.patch_split_num),
            }
            depth, _ = model.infer(
                variables, image_lr, image_hr,
                cai_mode=args.cai_mode, process_num=args.process_num, tile_cfg=tile,
            )
            depth = np.asarray(depth)
        np.save(os.path.join(args.out, f"{name}.npy"), depth)
        print(f"{name}: depth {depth.shape} range [{depth.min():.3f}, {depth.max():.3f}]")


if __name__ == "__main__":
    main()
