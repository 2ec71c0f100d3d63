"""remat=True must keep the param tree and gradients (PatchRefinerPlus
rematerializes the refiner encoder + fusion head to fit the reference's
bs=4/device training recipe in 16 GB HBM; docs/performance.md)."""

import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


def test_remat_preserves_tree_and_grads():
    cfg = dict(tiny_config())
    m0 = MODELS.build(dict(type="PatchRefinerPlus", config=dict(cfg)))
    cfg_r = dict(cfg)
    cfg_r["remat"] = True
    m1 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg_r))

    v = m0.init(jax.random.PRNGKey(0))
    v1 = m1.init(jax.random.PRNGKey(0))
    assert jtu.tree_structure(v) == jtu.tree_structure(v1)

    rng = np.random.RandomState(0)
    batch = {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "depth_gt": jnp.asarray(rng.rand(1, 168, 224, 1) * 50 + 1, jnp.float32),
        "crop_depths": jnp.asarray(rng.rand(1, 84, 112, 1) * 50 + 1, jnp.float32),
        "bboxs": jnp.asarray([[10.0, 10.0, 60.0, 50.0]], jnp.float32),
    }

    def total(model):
        def f(p):
            ld, _ = model.loss({**v, "params": p}, batch)
            return ld["total_loss"]

        return f

    l0, g0 = jax.jit(jax.value_and_grad(total(m0)))(v["params"])
    l1, g1 = jax.jit(jax.value_and_grad(total(m1)))(v["params"])
    assert abs(float(l0) - float(l1)) < 1e-4
    diffs = jtu.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    # recompute reassociates f32 reductions; ~1e-4 jitter is expected
    assert max(jtu.tree_leaves(diffs)) < 5e-3
