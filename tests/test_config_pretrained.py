"""The reference's staged-training checkpoint flow: in-config keys
(pretrain_coarse_model / pretrained / load_whole / whole_pretrained,
patchrefinerplus.py:105-205) must restore the matching subtrees at build
time via utils.checkpoint.apply_config_pretrained."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.utils.checkpoint import (
    apply_config_pretrained,
    load_checkpoint,
    save_checkpoint,
)
from tests.test_models import tiny_config

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_pretrain_coarse_model_and_pretrained(tmp_path):
    cfg = dict(tiny_config())
    base = MODELS.build(dict(type="PatchRefinerPlus", config=dict(cfg)))
    v_src = base.init(jax.random.PRNGKey(7))

    # stage-1 artifact: a coarse-pretrain checkpoint (branch tree at root,
    # like BaselinePretrain.save)
    coarse_ckpt = tmp_path / "coarse_ck"
    save_checkpoint(str(coarse_ckpt), {"params": v_src["params"]["coarse"]})
    # stage-2 artifact: a full PRPlusNet checkpoint (m0s1-style)
    whole_ckpt = tmp_path / "whole_ck"
    save_checkpoint(str(whole_ckpt), {"params": v_src["params"]})

    cfg2 = dict(cfg)
    cfg2["pretrain_coarse_model"] = str(coarse_ckpt)
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg2))
    v = model.init(jax.random.PRNGKey(0))
    assert not _tree_equal(v["params"]["coarse"], v_src["params"]["coarse"])
    v = apply_config_pretrained(model, v)
    assert _tree_equal(v["params"]["coarse"], v_src["params"]["coarse"])
    # other families untouched (different seed -> different values)
    assert not _tree_equal(v["params"]["fusion"], v_src["params"]["fusion"])

    # 'pretrained' with load_whole=False must NOT touch the coarse branch
    cfg3 = dict(cfg)
    cfg3["pretrained"] = str(whole_ckpt)
    cfg3["load_whole"] = False
    model3 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg3))
    v3 = model3.init(jax.random.PRNGKey(1))
    coarse_before = v3["params"]["coarse"]
    v3 = apply_config_pretrained(model3, v3)
    assert _tree_equal(v3["params"]["fusion"], v_src["params"]["fusion"])
    assert _tree_equal(v3["params"]["coarse"], coarse_before)

    # missing path: silently keeps the random init
    cfg4 = dict(cfg)
    cfg4["pretrained"] = str(tmp_path / "does_not_exist")
    model4 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg4))
    v4 = model4.init(jax.random.PRNGKey(2))
    v4b = apply_config_pretrained(model4, v4)
    assert _tree_equal(v4["params"], v4b["params"])


def test_coarse_branch_pretrained_resource(tmp_path):
    """coarse_branch.pretrained_resource ('local::<path>',
    zoedepth_v1.py:307-311) grafts a ZoeDepth checkpoint under
    params/coarse; missing paths keep random init."""
    cfg = dict(tiny_config())
    base = MODELS.build(dict(type="PatchRefinerPlus", config=dict(cfg)))
    v_src = base.init(jax.random.PRNGKey(9))
    ckpt = tmp_path / "zoe_ck"
    save_checkpoint(str(ckpt), {"params": v_src["params"]["coarse"]})

    cfg2 = dict(cfg)
    cfg2["coarse_branch"] = dict(
        cfg["coarse_branch"], pretrained_resource="local::" + str(ckpt)
    )
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg2))
    v = model.init(jax.random.PRNGKey(0))
    assert not _tree_equal(v["params"]["coarse"], v_src["params"]["coarse"])
    v = apply_config_pretrained(model, v)
    assert _tree_equal(v["params"]["coarse"], v_src["params"]["coarse"])
    assert not _tree_equal(v["params"]["fusion"], v_src["params"]["fusion"])

    # missing path: logged, random init kept
    cfg3 = dict(cfg)
    cfg3["coarse_branch"] = dict(
        cfg["coarse_branch"],
        pretrained_resource="local::" + str(tmp_path / "nope.pt"),
    )
    model3 = MODELS.build(dict(type="PatchRefinerPlus", config=cfg3))
    v3 = model3.init(jax.random.PRNGKey(1))
    v3b = apply_config_pretrained(model3, v3)
    assert _tree_equal(v3["params"], v3b["params"])


def test_pretrained_resource_precedence(tmp_path):
    """pretrained_resource loads FIRST (build-time in the reference), so a
    pretrain_coarse_model checkpoint must override it."""
    cfg = dict(tiny_config())
    base = MODELS.build(dict(type="PatchRefinerPlus", config=dict(cfg)))
    v_res = base.init(jax.random.PRNGKey(11))
    v_pre = base.init(jax.random.PRNGKey(12))
    res_ckpt = tmp_path / "res_ck"
    save_checkpoint(str(res_ckpt), {"params": v_res["params"]["coarse"]})
    pre_ckpt = tmp_path / "pre_ck"
    save_checkpoint(str(pre_ckpt), {"params": v_pre["params"]["coarse"]})

    cfg2 = dict(cfg)
    cfg2["coarse_branch"] = dict(
        cfg["coarse_branch"], pretrained_resource="local::" + str(res_ckpt)
    )
    cfg2["pretrain_coarse_model"] = str(pre_ckpt)
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg2))
    v = apply_config_pretrained(model, model.init(jax.random.PRNGKey(0)))
    assert _tree_equal(v["params"]["coarse"], v_pre["params"]["coarse"])
    assert not _tree_equal(v["params"]["coarse"], v_res["params"]["coarse"])


def test_async_checkpoint_roundtrip(tmp_path):
    """block=False saves overlap the disk write with compute; a new save or
    load joins the in-flight write first (utils/checkpoint.py)."""
    import numpy as np

    from patchrefinerv2_tpu.utils.checkpoint import (
        load_checkpoint,
        wait_for_checkpoints,
    )

    t1 = {"params": {"w": np.arange(8, dtype=np.float32)}, "step": 3}
    t2 = {"params": {"w": np.ones(8, dtype=np.float32)}, "step": 4}
    save_checkpoint(str(tmp_path / "c1"), t1, block=False)
    # second async save must join the first, then overwrite is fine
    save_checkpoint(str(tmp_path / "c2"), t2, block=False)
    got1 = load_checkpoint(str(tmp_path / "c1"))  # joins the in-flight write
    got2 = load_checkpoint(str(tmp_path / "c2"))
    wait_for_checkpoints()
    np.testing.assert_array_equal(got1["params"]["w"], t1["params"]["w"])
    assert int(got1["step"]) == 3
    np.testing.assert_array_equal(got2["params"]["w"], t2["params"]["w"])
    assert int(got2["step"]) == 4
