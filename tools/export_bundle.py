#!/usr/bin/env python
"""Export a config + checkpoint as a self-contained pretrained bundle
(the local from_pretrained equivalent of the reference's hub mixin,
estimator/models/patchrefinerplus.py:60 + docs/user_infer.md:52-56).

Usage:
    python tools/export_bundle.py CONFIG BUNDLE_DIR [--ckp-path CKPT]
        [--cfg-option k=v ...]

Restore later with::

    from patchrefinerv2_tpu.utils.bundle import load_bundle
    model, variables, cfg = load_bundle("BUNDLE_DIR")
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from patchrefinerv2_tpu.config import Config
from patchrefinerv2_tpu.registry import build_model
from patchrefinerv2_tpu.utils.bundle import save_bundle
from patchrefinerv2_tpu.utils.checkpoint import (
    apply_config_pretrained,
    load_checkpoint,
    merge_pretrained,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("bundle_dir")
    parser.add_argument("--ckp-path", default=None)
    parser.add_argument("--cfg-option", nargs="+", default=None)
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_option)
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0))
    variables = apply_config_pretrained(model, variables)
    if args.ckp_path:
        ckpt = load_checkpoint(args.ckp_path)
        params = merge_pretrained(variables["params"], ckpt["params"])
        variables = dict(variables, params=params)
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]
    save_bundle(args.bundle_dir, cfg, variables)
    print(f"bundle written to {args.bundle_dir}")


if __name__ == "__main__":
    main()
