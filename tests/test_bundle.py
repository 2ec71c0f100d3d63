"""Bundle round-trip: save_bundle -> load_bundle restores the same model
config and weights (local from_pretrained equivalent of the reference's
hub mixin, patchrefinerplus.py:60 + docs/user_infer.md:52-56)."""

import jax
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.config import Config
from patchrefinerv2_tpu.registry import build_model
from patchrefinerv2_tpu.utils.bundle import load_bundle, save_bundle

from test_models import tiny_config


def test_bundle_roundtrip(tmp_path):
    cfg = Config.fromdict(dict(model=dict(type="PatchRefinerPlus", config=tiny_config())))
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0))
    # perturb one leaf so the restore is distinguishable from a fresh init
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    leaves[0] = leaves[0] + 1.25
    variables = dict(variables, params=jax.tree_util.tree_unflatten(treedef, leaves))

    bdir = str(tmp_path / "bundle")
    save_bundle(bdir, cfg, variables)
    model2, vars2, cfg2 = load_bundle(bdir)

    assert cfg2.model.type == "PatchRefinerPlus"
    assert list(model2.tile_cfg.image_raw_shape) == [168, 224]
    l1 = jax.tree_util.tree_leaves(variables["params"])
    l2 = jax.tree_util.tree_leaves(vars2["params"])
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
