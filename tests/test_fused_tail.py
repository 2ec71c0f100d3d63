"""Fused decoder-tail Pallas kernel vs the plain XLA op chain
(interpret mode): the DoubleConv (gelu(conv) x2) + final_conv + update
clamp of the V2 fusion head's last stage (fusion_model.py:7-35 +
bi_directional_fusion_model.py:441-446), including row-block halos and
the out-of-tensor edge re-zeroing between chained SAME convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.ops.fused_tail import fused_decoder_tail


def _ref(xcat, base, w0, w1, wf, relu_clamp=True):
    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    d = jax.nn.gelu(conv(xcat, w0), approximate=False)
    d = jax.nn.gelu(conv(d, w1), approximate=False)
    off = conv(d, wf)
    out = base + off
    if relu_clamp:
        out = jnp.maximum(out, 0.0)
    return out, d


@pytest.mark.parametrize("shape", [(2, 48, 64, 11, 7, 5), (1, 8, 40, 3, 4, 2)])
def test_fused_tail_matches_xla_chain(shape):
    b, h, w, cin, mid, co = shape
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    xcat = jax.random.normal(k[0], (b, h, w, cin))
    base = jax.random.normal(k[1], (b, h, w, 1))
    w0 = jax.random.normal(k[2], (3, 3, cin, mid)) * 0.1
    w1 = jax.random.normal(k[3], (3, 3, mid, co)) * 0.1
    wf = jax.random.normal(k[4], (3, 3, co, 1)) * 0.1
    d_k, f_k = fused_decoder_tail(xcat, base, w0, w1, wf, interpret=True)
    d_r, f_r = _ref(xcat, base, w0, w1, wf)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), atol=5e-6, rtol=5e-6)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r), atol=5e-6, rtol=5e-6)


def test_fused_tail_rejects_unsupported_height():
    """Heights with no row-block divisor >= 3 (the 3-row halo cannot be
    sourced from one neighbour block) must fail loudly, not mid-kernel."""
    b, h, w, cin, mid, co = 1, 10, 32, 4, 4, 3
    k = jax.random.split(jax.random.PRNGKey(7), 5)
    xcat = jax.random.normal(k[0], (b, h, w, cin))
    base = jax.random.normal(k[1], (b, h, w, 1))
    w0 = jax.random.normal(k[2], (3, 3, cin, mid)) * 0.1
    w1 = jax.random.normal(k[3], (3, 3, mid, co)) * 0.1
    wf = jax.random.normal(k[4], (3, 3, co, 1)) * 0.1
    with pytest.raises(ValueError, match="row-block divisor"):
        fused_decoder_tail(xcat, base, w0, w1, wf, interpret=True)


def test_fused_tail_no_clamp():
    b, h, w, cin, mid, co = 1, 16, 32, 4, 4, 3
    k = jax.random.split(jax.random.PRNGKey(3), 5)
    xcat = jax.random.normal(k[0], (b, h, w, cin))
    base = jax.random.normal(k[1], (b, h, w, 1))
    w0 = jax.random.normal(k[2], (3, 3, cin, mid)) * 0.1
    w1 = jax.random.normal(k[3], (3, 3, mid, co)) * 0.1
    wf = jax.random.normal(k[4], (3, 3, co, 1)) * 0.1
    d_k, _ = fused_decoder_tail(xcat, base, w0, w1, wf, relu_clamp=False,
                                interpret=True)
    d_r, _ = _ref(xcat, base, w0, w1, wf, relu_clamp=False)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), atol=5e-6, rtol=5e-6)
