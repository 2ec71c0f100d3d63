"""Tensor-parallel coarse-trunk sharding over a 2-D (data, model) mesh.

The reference has no model parallelism (NCCL DDP only,
estimator/utils/dist.py:6-43); parallel/tp.py is the TPU-native extension
that shards the coarse ViT trunk Megatron-style so the whole-image coarse
forward — the replicated residual of patch-chunk sharding — also scales.
These tests pin (a) the rule matcher and (b) numerical equality of the
2-D-mesh tiled inference against the single-device program on the virtual
8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from patchrefinerv2_tpu.parallel.tp import _spec_for, shard_tp, tp_mesh
from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config


def test_spec_rules_match_suffixes():
    assert _spec_for(("params", "coarse", "blocks_0", "attn", "qkv", "kernel"),
                     (96, 288), 4) == P(None, "model")
    assert _spec_for(("params", "coarse", "blocks_0", "attn", "proj", "kernel"),
                     (96, 96), 4) == P("model", None)
    assert _spec_for(("params", "coarse", "blocks_0", "mlp", "fc1", "kernel"),
                     (96, 384), 4) == P(None, "model")
    assert _spec_for(("params", "block3", "fc2", "kernel"), (384, 96), 4) \
        == P("model", None)
    # non-divisible sharded dim stays replicated
    assert _spec_for(("attn", "qkv", "kernel"), (96, 290), 4) == P()
    # non-matching leaves stay replicated
    assert _spec_for(("fusion", "conv", "kernel"), (3, 3, 64, 64), 4) == P()
    assert _spec_for(("attn", "qkv", "bias"), (288,), 4) == P()


@pytest.fixture(scope="module")
def model_and_vars():
    model = MODELS.build(dict(type="PatchRefinerPlus", config=tiny_config()))
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_shard_tp_placement(model_and_vars):
    _, variables = model_and_vars
    mesh = tp_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    sharded = shard_tp(variables, mesh, within="coarse")
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    n_sharded = 0
    for path, leaf in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        spec = leaf.sharding.spec
        if len(spec) and any(s is not None for s in spec):
            assert "coarse" in keys, f"non-coarse leaf sharded: {keys}"
            assert keys[-1] == "kernel"
            n_sharded += 1
    # the vitt trunk has 4 blocks x 4 TP kernels each
    assert n_sharded >= 16, f"only {n_sharded} coarse-trunk leaves TP-sharded"


def test_tp_sharded_infer_matches_single_device(model_and_vars):
    """2-D (data=2, model=4) mesh tiled inference == the single-device
    program: the patch chunk shards over 'data' while the coarse trunk's
    attention/MLP kernels shard over 'model' (GSPMD inserts collectives)."""
    model, variables = model_and_vars
    rng = np.random.RandomState(21)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    d1, c1 = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=8)
    d2, c2 = model.infer(
        variables, image_lr, image_hr, cai_mode="m1", process_num=8,
        mesh=tp_mesh(4),
    )
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5, rtol=1e-5)
    # process_num must divide the DATA axis (2), not the full mesh (8)
    d3, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="m1", process_num=2,
        mesh=tp_mesh(4),
    )
    assert np.asarray(d3).shape == np.asarray(d1).shape


def test_tp_sharded_infer_rn_matches_single_device(model_and_vars):
    """The full rN program (shifted + random passes) under the 2-D mesh."""
    model, variables = model_and_vars
    rng = np.random.RandomState(22)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)
    seed = jax.random.PRNGKey(5)
    d1, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r8", process_num=8, seed=seed
    )
    d2, _ = model.infer(
        variables, image_lr, image_hr, cai_mode="r8", process_num=8, seed=seed,
        mesh=tp_mesh(2),
    )
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5, rtol=1e-5)
