"""Mixed-precision training (config key ``train_dtype: bfloat16``).

The forward/backward compute runs bf16 while the caller's params stay f32
master weights: gradients must come back f32 (through the in-loss cast's
transpose), stay finite, point the same way as the f32 gradients, and the
loss value must be within bf16 rounding of the f32 one. No reference
counterpart (the reference trains f32/amp only)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


def _batch(rng):
    return {
        "image_lr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crops_image_hr": jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32),
        "crop_depths": jnp.asarray(1 + 10 * rng.rand(1, 84, 112, 1), jnp.float32),
        "bboxs": jnp.asarray([[0.0, 0.0, 56.0, 42.0]], jnp.float32),
    }


def test_bf16_train_loss_and_grads_match_f32():
    cfg16 = tiny_config()
    cfg16["train_dtype"] = "bfloat16"
    m32 = MODELS.build(dict(type="PatchRefinerPlus", config=tiny_config()))
    m16 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg16))
    variables = m32.init(jax.random.PRNGKey(0))
    params = variables["params"]
    bs = variables.get("batch_stats")
    batch = _batch(np.random.RandomState(3))

    def loss_of(model):
        def f(p):
            ld, aux = model.loss(
                {"params": p, "batch_stats": bs}, batch,
                rng=jax.random.PRNGKey(0), mutable=["batch_stats"],
            )
            return ld["total_loss"], aux
        return f

    (l32, aux32), g32 = jax.value_and_grad(loss_of(m32), has_aux=True)(params)
    (l16, aux16), g16 = jax.value_and_grad(loss_of(m16), has_aux=True)(params)

    # loss within bf16 rounding of the f32 program
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)

    flat32 = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g32)])
    flat16 = jnp.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(g16)])
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(g16))
    assert bool(jnp.isfinite(flat16).all())
    cos = float(
        jnp.vdot(flat16, flat32)
        / jnp.maximum(jnp.linalg.norm(flat16) * jnp.linalg.norm(flat32), 1e-12)
    )
    assert cos > 0.97, f"grad cosine {cos}"
    # the bf16 path actually ran in reduced precision
    assert float(l16) != float(l32)

    # mutated batch_stats stay f32 (BN running stats must not degrade)
    new_bs = aux16["variables"]["batch_stats"]
    assert all(
        x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(new_bs)
    )
