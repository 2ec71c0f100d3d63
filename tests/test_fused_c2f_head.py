"""Fused C2F out-head (ops/fused_f2r.py fused_c2f_head) vs the unfused
C2FModule chain, driven through the module so the param-mirror dispatch is
covered."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.models.blocks.dpt import C2FModule


def _inputs(key, feat=48, head2=32):
    sizes = [(16, 64), (8, 32), (4, 16), (2, 8), (1, 4)]
    ks = jax.random.split(key, 12)
    fine = [
        jax.random.normal(ks[i], (1, h, w, feat)) * 0.5
        for i, (h, w) in enumerate(sizes)
    ]
    coarse = [jax.random.normal(ks[5], (1, 32, 128, head2)) * 0.5] + [
        jax.random.normal(ks[6 + i], (1, h, w, feat)) * 0.5
        for i, (h, w) in enumerate(sizes)
    ]
    return fine, coarse


@pytest.mark.parametrize("gate", [True, False])
def test_fused_head_matches_module(monkeypatch, gate):
    # features=256 -> output_conv1 width 128 (the kernel's lane-aligned mid)
    fine, coarse = _inputs(jax.random.PRNGKey(0))
    m = C2FModule(features=256, head2_features=32, gate=gate, fusion=True)
    params = m.init(jax.random.PRNGKey(1), fine, coarse)
    feats_ref, out_ref = m.apply(params, fine, coarse)

    monkeypatch.setenv("PRV2_FUSED_C2F_HEAD", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    feats, out = m.apply(params, fine, coarse)

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=3e-4, atol=3e-4
    )
    # last_feat (the distill/fusion feature) must match too
    np.testing.assert_allclose(
        np.asarray(feats[-1]), np.asarray(feats_ref[-1]), rtol=3e-4, atol=3e-4
    )
    # untouched pyramid levels identical
    for a, b in zip(feats[:-1], feats_ref[:-1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_head_bf16(monkeypatch):
    fine, coarse = _inputs(jax.random.PRNGKey(2))
    m = C2FModule(features=256, head2_features=32, gate=True, fusion=True)
    params = m.init(jax.random.PRNGKey(3), fine, coarse)
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    fb = [x.astype(jnp.bfloat16) for x in fine]
    cb = [x.astype(jnp.bfloat16) for x in coarse]
    _, out_ref = m.apply(pb, fb, cb)

    monkeypatch.setenv("PRV2_FUSED_C2F_HEAD", "1")
    _, out = m.apply(pb, fb, cb)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32),
        rtol=0.1, atol=0.08,
    )
