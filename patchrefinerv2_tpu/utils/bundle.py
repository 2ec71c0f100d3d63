"""One-call pretrained bundles — the local equivalent of the reference's
``PyTorchModelHubMixin`` entry (estimator/models/patchrefinerplus.py:60,
docs/user_infer.md:52-56): a single directory holding the full config and
an orbax checkpoint, restored into a ready-to-infer (model, variables)
pair with one call.

Layout::

    bundle_dir/
      config.json   # full Config (model + tile geometry + data surface)
      ckpt/         # orbax StandardCheckpointer tree {params[, batch_stats]}
"""

from __future__ import annotations

import json
import os

import jax

from patchrefinerv2_tpu.config import Config
from patchrefinerv2_tpu.registry import build_model
from patchrefinerv2_tpu.utils.checkpoint import (
    load_checkpoint,
    merge_pretrained,
    save_checkpoint,
)


def save_bundle(bundle_dir: str, cfg, variables: dict) -> None:
    """Write config + weights as a self-contained bundle directory."""
    os.makedirs(bundle_dir, exist_ok=True)
    cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    with open(os.path.join(bundle_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=1, default=str)
    tree = {"params": variables["params"]}
    if variables.get("batch_stats"):
        tree["batch_stats"] = variables["batch_stats"]
    save_checkpoint(os.path.join(bundle_dir, "ckpt"), tree)


def load_bundle(bundle_dir: str, seed: int = 0):
    """Restore (model, variables, cfg) from a bundle directory.

    The model is built from the bundled config, initialised, and the
    bundled weights merged over the init (strict=False, so older bundles
    keep working across additive model changes — mirroring the
    reference's strict=False load_state_dict discipline)."""
    with open(os.path.join(bundle_dir, "config.json")) as f:
        cfg = Config.fromdict(json.load(f))
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(seed))
    ckpt = load_checkpoint(os.path.join(bundle_dir, "ckpt"))
    params = merge_pretrained(variables["params"], ckpt["params"])
    variables = dict(variables, params=params)
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    return model, variables, cfg
