#!/usr/bin/env python
"""Training entry point (reconstructs the reference CLI surface,
README.md:57-77 / docs/user_training.md — tools/train.py is absent from the
reference snapshot; behavior rebuilt from the Trainer API).

Usage:
    python tools/train.py CONFIG [--work-dir D] [--tag T] [--debug]
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
from patchrefinerv2_tpu.training.trainer import Trainer
from patchrefinerv2_tpu.utils.misc import fix_random_seed, log_env, setup_distributed
from patchrefinerv2_tpu.utils.logging import print_log


def main():
    # before any backend query (multi-host coordination, opt-in via env)
    setup_distributed()
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--log-name", default=None)
    parser.add_argument("--tag", default="")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--seed", type=int, default=621)
    parser.add_argument("--resume-from", default=None)
    parser.add_argument(
        "--cfg-option", nargs="+", default=None, help="dotted key=value overrides"
    )
    parser.add_argument(
        "--debug-nans", action="store_true",
        help="jax_debug_nans: re-run the op that produced a NaN eagerly "
        "and raise with its location (slow; debugging only)")
    parser.add_argument(
        "--tp", type=int, default=1, metavar="M",
        help="tensor-parallel degree: train over a 2-D (data, model=M) "
        "mesh with the coarse trunk's attention/MLP kernels sharded over "
        "'model' (parallel/tp.py); 1 = pure data parallel")
    args = parser.parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_option)
    cfg["seed"] = args.seed
    cfg["debug"] = args.debug
    if args.resume_from:
        cfg["resume_from"] = args.resume_from
    fix_random_seed(args.seed)
    log_env(cfg)

    work_dir = args.work_dir or os.path.join(
        "./work_dir", os.path.splitext(os.path.basename(args.config))[0], args.tag
    )

    model = build_model(cfg.model)
    train_ds = build_dataset(cfg.train_dataloader.dataset)
    train_loader = DataLoader(
        train_ds,
        batch_size=cfg.train_dataloader.get("batch_size", 4),
        shuffle=True,
        seed=args.seed,
        num_workers=cfg.train_dataloader.get("num_workers", 1),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    val_loader = None
    if cfg.get("val_dataloader"):
        try:
            val_ds = build_dataset(cfg.val_dataloader.dataset)
            val_loader = DataLoader(val_ds, batch_size=1, shuffle=False)
        except (FileNotFoundError, OSError) as e:
            print_log(f"val dataset unavailable ({e}); skipping validation")

    mesh = None
    if args.tp > 1:
        from patchrefinerv2_tpu.parallel.tp import tp_mesh

        mesh = tp_mesh(args.tp)
    trainer = Trainer(cfg, model, train_loader, val_loader, work_dir=work_dir,
                      mesh=mesh)
    trainer.run()


if __name__ == "__main__":
    main()
