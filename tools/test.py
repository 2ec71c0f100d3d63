#!/usr/bin/env python
"""Evaluation / inference entry point (reference CLI: README.md:57-77,
docs/user_infer.md; tools/test.py absent from the snapshot, rebuilt from
the Tester API).

Usage:
    python tools/test.py CONFIG --ckp-path CKPT [--cai-mode m1|m2|rN]
        [--process-num 4] [--test-type normal|general|consistency|gen]
        [--save] [--image-raw-shape H W] [--patch-split-num h w]
        [--cfg-option k=v ...]
"""

import argparse
import os

import jax

# Honor JAX_PLATFORMS even where a python startup hook registers a TPU
# plugin backend unconditionally (the env var alone is then ineffective;
# same route as tests/conftest.py): flip jax.config BEFORE any backend
# query locks the platform in.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from patchrefinerv2_tpu.config import Config
from patchrefinerv2_tpu.registry import build_dataset, build_model
from patchrefinerv2_tpu.datasets.base import DataLoader
from patchrefinerv2_tpu.evaluation.tester import Tester
from patchrefinerv2_tpu.utils.checkpoint import load_checkpoint, merge_pretrained
from patchrefinerv2_tpu.utils.misc import fix_random_seed, log_env, setup_distributed


def main():
    # before any backend query (multi-host coordination, opt-in via env)
    setup_distributed()
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--ckp-path", default=None)
    parser.add_argument("--cai-mode", default="m1")
    parser.add_argument("--process-num", type=int, default=4)
    parser.add_argument(
        "--test-type", default="normal",
        choices=["normal", "general", "consistency", "gen", "benchmark"],
    )
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--gray-scale", action="store_true")
    parser.add_argument("--work-dir", default="./work_dir/test")
    # default to the model config's tile geometry; explicit flags override
    # (reference defaults are 2160 3840 / 4 4, baked into its configs)
    parser.add_argument("--image-raw-shape", nargs=2, type=int, default=None)
    parser.add_argument("--patch-split-num", nargs=2, type=int, default=None)
    parser.add_argument("--cfg-option", nargs="+", default=None)
    parser.add_argument("--bench-iters", type=int, default=50)
    parser.add_argument("--bench-warmup", type=int, default=20)
    parser.add_argument("--bench-repeats", type=int, default=10)
    parser.add_argument(
        "--shard-patches", type=int, default=0, metavar="TP",
        help="shard each patch chunk across local devices during tiled "
        "inference (single-image latency). 0=off; 1=1-D data mesh; m>1 "
        "additionally shards the coarse trunk tensor-parallel over a "
        "(data, model=m) mesh (parallel/tp.py)")
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_option)
    fix_random_seed(621)
    log_env(cfg)

    model = build_model(cfg.model)
    if args.image_raw_shape is None:
        args.image_raw_shape = list(model.tile_cfg.image_raw_shape)
    if args.patch_split_num is None:
        args.patch_split_num = list(model.tile_cfg.patch_split_num)
    variables = model.init(jax.random.PRNGKey(0))
    from patchrefinerv2_tpu.utils.checkpoint import apply_config_pretrained

    variables = apply_config_pretrained(model, variables)
    if args.ckp_path:
        ckpt = load_checkpoint(args.ckp_path)
        params = merge_pretrained(variables["params"], ckpt["params"])
        variables = dict(variables, params=params)
        if "batch_stats" in ckpt and ckpt["batch_stats"]:
            variables["batch_stats"] = ckpt["batch_stats"]

    loader_key = {
        "normal": "test_in_dataloader",
        "general": "general_dataloader",
        "consistency": "val_consistency_dataloader",
        "gen": "general_dataloader",
        "benchmark": "test_in_dataloader",
    }[args.test_type]
    ds_cfg = cfg.get(loader_key, cfg.get("val_dataloader"))
    dataset = build_dataset(ds_cfg.dataset)
    loader = DataLoader(dataset, batch_size=1, shuffle=False,
                        num_workers=ds_cfg.get("num_workers", 1),
                        process_index=jax.process_index(), process_count=jax.process_count())

    mesh = None
    if args.shard_patches:
        if args.shard_patches > 1:
            from patchrefinerv2_tpu.parallel.tp import tp_mesh

            mesh = tp_mesh(args.shard_patches)
        else:
            from patchrefinerv2_tpu.parallel.mesh import data_mesh

            mesh = data_mesh()
    tester = Tester(cfg, model, loader, work_dir=args.work_dir, save=args.save,
                    gray_scale=args.gray_scale, mesh=mesh)
    if args.test_type == "benchmark":
        # fps + FLOPs/params on the first image (Tester.benchmark,
        # reference tester.py:325-404 incl. benchmark.txt + complexity)
        import jax.numpy as jnp

        batch = next(iter(loader))
        image_lr = jnp.asarray(batch["image_lr"])
        image_hr = jnp.asarray(batch.get("image_hr", batch["image_lr"]))
        tile = dict(image_raw_shape=list(args.image_raw_shape),
                    patch_split_num=list(args.patch_split_num))
        tester.benchmark(
            variables, image_lr, image_hr,
            cai_mode=args.cai_mode, process_num=args.process_num, tile_cfg=tile,
            iters=args.bench_iters, warmup=args.bench_warmup,
            repeats=args.bench_repeats,
        )
        tester.model_complexity(
            variables,
            image_lr_shape=tuple(image_lr.shape),
            image_hr_shape=tuple(image_hr.shape),
            cai_mode=args.cai_mode, process_num=args.process_num, tile_cfg=tile,
        )
    elif args.test_type == "gen":
        tester.generate_pl(
            variables, cai_mode=args.cai_mode, process_num=args.process_num
        )
    elif args.test_type == "consistency":
        tester.run_consistency(variables, process_num=args.process_num)
    else:
        tester.run(
            variables,
            cai_mode=args.cai_mode,
            process_num=args.process_num,
            image_raw_shape=tuple(args.image_raw_shape),
            patch_split_num=tuple(args.patch_split_num),
        )


if __name__ == "__main__":
    main()
