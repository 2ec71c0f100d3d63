"""Goldens for the fused Pallas bilinear resize (ops/pallas_resize.py).

Run on CPU via the interpreter (the kernel auto-selects interpret mode off
TPU); numerics must match the dense resize-matrix path, which is itself
golden-tested against torch F.interpolate in test_resize.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.ops.pallas_resize import (
    bilinear_resize_fused,
    bilinear_resize_pallas,
    pallas_resize_supported,
)
from patchrefinerv2_tpu.ops.resize import resize, resize_matrix

# interpret mode executes the full grid serially — keep shapes small
CASES = [
    ((2, 12, 16, 256), (24, 32), True),   # x2 up (DPT refinenet step)
    ((1, 24, 32, 128), (12, 16), True),   # x2 down
    ((1, 12, 16, 128), (30, 40), True),   # non-integer up
    ((2, 12, 16, 256), (24, 32), False),  # align_corners=False
    ((1, 9, 11, 128), (17, 23), True),    # ragged spatial sizes
]


@pytest.mark.parametrize("shape,size,ac", CASES)
def test_matches_dense_path_f32(shape, size, ac):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    assert pallas_resize_supported(shape, size, "bilinear", 4)
    ref = resize(x, size, "bilinear", ac)
    got = bilinear_resize_pallas(x, size, ac)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_bf16_close_to_f32_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 16, 128), jnp.float32)
    ref = resize(x, (24, 32), "bilinear", True)
    got = bilinear_resize_pallas(x.astype(jnp.bfloat16), (24, 32), True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.06
    )


def test_unsupported_shapes_gated():
    # small / ragged channel counts must fall back to the dense path
    assert not pallas_resize_supported((1, 12, 16, 96), (24, 32), "bilinear", 4)
    assert not pallas_resize_supported((1, 12, 16, 1), (24, 32), "bilinear", 4)
    assert not pallas_resize_supported((1, 12, 16, 128), (24, 32), "nearest", 4)
    assert not pallas_resize_supported((1, 1, 16, 128), (24, 32), "bilinear", 4)


def test_custom_vjp_matches_dense_grad():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 16, 128), jnp.float32)
    ct = jnp.asarray(rng.randn(1, 24, 32, 128), jnp.float32)

    def via_pallas(a):
        return jnp.vdot(bilinear_resize_fused(a, (24, 32), True), ct)

    def via_dense(a):
        wm_h = jnp.asarray(resize_matrix(12, 24, "bilinear", True))
        wm_w = jnp.asarray(resize_matrix(16, 32, "bilinear", True))
        y = jnp.einsum("oh,nhwc->nowc", wm_h, a, precision="highest")
        y = jnp.einsum("pw,nowc->nopc", wm_w, y, precision="highest")
        return jnp.vdot(y, ct)

    g_pallas = jax.grad(via_pallas)(x)
    g_dense = jax.grad(via_dense)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense), atol=2e-5)
