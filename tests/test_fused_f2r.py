"""Fused f2r tail (ops/fused_f2r.py) vs the unfused BiDirectionalFusion
chain, driven through the module so the param-mirror dispatch is covered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.models.blocks.fusion import BiDirectionalFusion


def _pyramid(key, n, h, w, chans):
    feats = []
    kh, kw = h, w
    for i, c in enumerate(chans):
        key, sub = jax.random.split(key)
        feats.append(jax.random.normal(sub, (n, kh, kw, c)) * 0.5)
        kh, kw = max(kh // 2, 1), max(kw // 2, 1)
    return feats


def _build_module():
    return BiDirectionalFusion(
        coarse2fine=False,
        coarse_chl=(32, 64, 64, 64, 64, 64),
        fine_chl=(16, 24, 40, 112, 960),
        fine_chl_after_coarse2fine=(32, 64, 64, 64, 64, 64),
        temp_chl=(32, 64, 64, 128, 256, 512),
        dec_chl=(512, 256, 128, 64, 32),
    )


@pytest.mark.parametrize("with_base", [True, False])
def test_fused_tail_matches_module(monkeypatch, with_base):
    n, h, w = 1, 32, 128
    key = jax.random.PRNGKey(0)
    c_feat = _pyramid(jax.random.PRNGKey(1), n, h, w, (32, 64, 64, 64, 64, 64))
    f_feat = _pyramid(jax.random.PRNGKey(2), n, h, w, (32, 64, 64, 64, 64, 64))
    pred1 = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, 1)) * 0.5
    pred2 = jax.random.normal(jax.random.PRNGKey(4), (n, h, w, 1)) * 0.5
    base = (
        jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n, h, w, 1))) * 3
        if with_base
        else None
    )

    m = _build_module()
    params = m.init(key, c_feat, f_feat, pred1, pred2, update_base=base)
    ref = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)

    monkeypatch.setenv("PRV2_FUSED_F2R", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    got = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_tail_bf16(monkeypatch):
    n, h, w = 1, 32, 128
    to = lambda t: [x.astype(jnp.bfloat16) for x in t]
    c_feat = _pyramid(jax.random.PRNGKey(1), n, h, w, (32, 64, 64, 64, 64, 64))
    f_feat = _pyramid(jax.random.PRNGKey(2), n, h, w, (32, 64, 64, 64, 64, 64))
    pred1 = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, 1)) * 0.5
    pred2 = jax.random.normal(jax.random.PRNGKey(4), (n, h, w, 1)) * 0.5
    base = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n, h, w, 1))) * 3

    m = _build_module()
    params = m.init(jax.random.PRNGKey(0), c_feat, f_feat, pred1, pred2,
                    update_base=base)
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    args = (to(c_feat), to(f_feat), pred1.astype(jnp.bfloat16),
            pred2.astype(jnp.bfloat16))
    ref = m.apply(pb, *args, update_base=base.astype(jnp.bfloat16)).astype(jnp.float32)

    monkeypatch.setenv("PRV2_FUSED_F2R", "1")
    got = m.apply(pb, *args, update_base=base.astype(jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.08)


def test_return_feat_keeps_unfused(monkeypatch):
    """return_feat needs the pre-final feature -> fused path must not fire."""
    n, h, w = 1, 32, 128
    c_feat = _pyramid(jax.random.PRNGKey(1), n, h, w, (32, 64, 64, 64, 64, 64))
    f_feat = _pyramid(jax.random.PRNGKey(2), n, h, w, (32, 64, 64, 64, 64, 64))
    pred1 = jnp.zeros((n, h, w, 1))
    pred2 = jnp.zeros((n, h, w, 1))
    m = _build_module()
    params = m.init(jax.random.PRNGKey(0), c_feat, f_feat, pred1, pred2)
    monkeypatch.setenv("PRV2_FUSED_F2R", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    out, feat = m.apply(params, c_feat, f_feat, pred1, pred2, return_feat=True)
    assert feat.shape == (n, h, w, 32)


@pytest.mark.parametrize("with_tail", [False, True])
def test_fused_pair_matches_module(monkeypatch, with_tail):
    """Mid-level fused fusion pair (PRV2_FUSED_PAIR) — fires at level 1
    (16x128 here), alone and combined with the fused tail."""
    n, h, w = 1, 32, 256
    c_feat = _pyramid(jax.random.PRNGKey(1), n, h, w, (32, 64, 64, 64, 64, 64))
    f_feat = _pyramid(jax.random.PRNGKey(2), n, h, w, (32, 64, 64, 64, 64, 64))
    pred1 = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, 1)) * 0.5
    pred2 = jax.random.normal(jax.random.PRNGKey(4), (n, h, w, 1)) * 0.5
    base = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n, h, w, 1))) * 3

    m = _build_module()
    params = m.init(jax.random.PRNGKey(0), c_feat, f_feat, pred1, pred2,
                    update_base=base)
    ref = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)

    monkeypatch.setenv("PRV2_FUSED_PAIR", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    if with_tail:
        monkeypatch.setenv("PRV2_FUSED_F2R", "1")
    got = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_fused_dc_matches_module(monkeypatch):
    """Mid-level fused UpSample DoubleConv (PRV2_FUSED_DC) — fires at the
    level-1 decoder stage here."""
    n, h, w = 1, 32, 256
    c_feat = _pyramid(jax.random.PRNGKey(1), n, h, w, (32, 64, 64, 64, 64, 64))
    f_feat = _pyramid(jax.random.PRNGKey(2), n, h, w, (32, 64, 64, 64, 64, 64))
    pred1 = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, 1)) * 0.5
    pred2 = jax.random.normal(jax.random.PRNGKey(4), (n, h, w, 1)) * 0.5
    base = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (n, h, w, 1))) * 3

    m = _build_module()
    params = m.init(jax.random.PRNGKey(0), c_feat, f_feat, pred1, pred2,
                    update_base=base)
    ref = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)

    monkeypatch.setenv("PRV2_FUSED_DC", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    got = m.apply(params, c_feat, f_feat, pred1, pred2, update_base=base)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4)
