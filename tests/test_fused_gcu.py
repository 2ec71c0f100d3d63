"""Fused GatedConvUnit kernel (ops/fused_gcu.py) vs the XLA chain.

Also pins that the explicit-params GatedConvUnit rewrite is numerically
identical to the original nn.Conv/nn.LayerNorm composition (same param
tree, same outputs) — the checkpoint-layout invariant the converters and
estimator checkpoints rely on.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.models.blocks.dpt import GatedConvUnit
from patchrefinerv2_tpu.ops.fused_gcu import gated_conv_unit_fused


class _LegacyGCU(nn.Module):
    """The original module composition (pre-rewrite), kept as the golden."""

    features: int
    gate: bool = True
    fusion: bool = True

    @nn.compact
    def __call__(self, x, c_feat=None):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), use_bias=True)(out)
        out = out + x
        if self.fusion:
            fused = jnp.concatenate([out, c_feat], axis=-1)
            fused = nn.Conv(self.features, (3, 3), use_bias=True)(fused)
            fused = nn.LayerNorm(epsilon=1e-6)(fused)
            fused = nn.relu(fused)
            fused = nn.Conv(self.features, (1, 1), use_bias=False)(fused)
            if self.gate:
                out = out * nn.sigmoid(fused)
            else:
                out = fused
        return out


@pytest.mark.parametrize("gate,fusion", [(True, True), (False, True), (True, False)])
def test_rewrite_matches_legacy(gate, fusion):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 24))
    new = GatedConvUnit(32, gate, fusion)
    old = _LegacyGCU(32, gate, fusion)
    pn = new.init(rng, x, c if fusion else None)
    po = old.init(rng, x, c if fusion else None)
    # identical param trees (names, shapes, values from the same rng)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        pn, po,
    )
    yn = new.apply(pn, x, c if fusion else None)
    yo = old.apply(po, x, c if fusion else None)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(yo), rtol=1e-6, atol=1e-6)


def _make_params(key, c, cc, dtype):
    ks = jax.random.split(key, 6)
    s = 0.05
    return dict(
        k1=jax.random.normal(ks[0], (3, 3, c, c), dtype) * s,
        b1=jax.random.normal(ks[1], (c,), dtype) * s,
        k2=jax.random.normal(ks[2], (3, 3, c + cc, c), dtype) * s,
        b2=jax.random.normal(ks[3], (c,), dtype) * s,
        ln_s=1.0 + jax.random.normal(ks[4], (c,), dtype) * 0.1,
        ln_b=jax.random.normal(ks[5], (c,), dtype) * 0.1,
        k3=jax.random.normal(key, (1, 1, c, c), dtype) * s,
    )


def _xla_chain(x, c_feat, p, gate):
    from patchrefinerv2_tpu.models.blocks.dpt import _conv_same, _layer_norm

    out = _conv_same(nn.relu(x), p["k1"], p["b1"]) + x
    fused = _conv_same(jnp.concatenate([out, c_feat], axis=-1), p["k2"], p["b2"])
    fused = _layer_norm(fused, p["ln_s"], p["ln_b"])
    fused = _conv_same(nn.relu(fused), p["k3"], None)
    return out * nn.sigmoid(fused) if gate else fused


@pytest.mark.parametrize("mode", ["full", "tail"])
@pytest.mark.parametrize("gate", [True, False])
@pytest.mark.parametrize("c,cc", [(128, 128), (32, 32)])
def test_fused_kernel_matches_chain(mode, gate, c, cc):
    n, h, w = 2, 24, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, c)) * 0.5
    cf = jax.random.normal(jax.random.PRNGKey(2), (n, h, w, cc)) * 0.5
    p = _make_params(key, c, cc, jnp.float32)

    ref = _xla_chain(x, cf, p, gate)

    from patchrefinerv2_tpu.models.blocks.dpt import _conv_same

    k2a, k2b = p["k2"][:, :, :c, :], p["k2"][:, :, c:, :]
    p2b = _conv_same(cf, k2b, None)
    src = x if mode == "full" else _conv_same(nn.relu(x), p["k1"], p["b1"]) + x
    got = gated_conv_unit_fused(
        src, p2b, p["k1"], p["b1"], k2a, p["b2"], p["ln_s"], p["ln_b"],
        p["k3"], gate=gate, mode=mode, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_kernel_bf16_close():
    c = 128
    n, h, w = 1, 16, 128
    key = jax.random.PRNGKey(3)
    x = (jax.random.normal(jax.random.PRNGKey(4), (n, h, w, c)) * 0.5).astype(jnp.bfloat16)
    cf = (jax.random.normal(jax.random.PRNGKey(5), (n, h, w, c)) * 0.5).astype(jnp.bfloat16)
    p = _make_params(key, c, c, jnp.bfloat16)

    ref = _xla_chain(x, cf, p, True).astype(jnp.float32)

    from patchrefinerv2_tpu.models.blocks.dpt import _conv_same

    k2a, k2b = p["k2"][:, :, :c, :], p["k2"][:, :, c:, :]
    p2b = _conv_same(cf, k2b, None)
    got = gated_conv_unit_fused(
        x, p2b, p["k1"], p["b1"], k2a, p["b2"], p["ln_s"], p["ln_b"],
        p["k3"], gate=True, mode="full", interpret=True,
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.05)


def test_module_dispatches_fused(monkeypatch):
    """GatedConvUnit takes the fused path under PRV2_FUSED_GCU and stays
    close to the unfused output (interpret mode on CPU)."""
    c = 128
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128, c)) * 0.5
    cf = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 128, c)) * 0.5
    m = GatedConvUnit(c, True, True)
    params = m.init(jax.random.PRNGKey(0), x, cf)
    base = m.apply(params, x, cf)
    monkeypatch.setenv("PRV2_FUSED_GCU", "full")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")  # f32 dispatch for the test
    calls = []
    import patchrefinerv2_tpu.ops.fused_gcu as fg

    orig = fg.gated_conv_unit_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fg, "gated_conv_unit_fused", spy)
    fused = m.apply(params, x, cf)
    assert calls, "fused kernel was not dispatched"
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), rtol=2e-4, atol=2e-4
    )
