"""Dynamic-int8 conv path (ops/quant.py, opt-in PRV2_INT8).

Pins (a) the per-conv error bound of the int8 kernel against the f32
conv, and (b) that the end-to-end tiled inference under PRV2_INT8 stays
close to the f32 program (int8 rounding only — a wiring bug would be
O(1) off). No reference counterpart: the reference has no quantized
inference; this is the TPU-native serving mode gated on the
tools/microbench_int8.py feasibility measurement.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.models.blocks.dpt import _conv_same
from patchrefinerv2_tpu.ops.quant import int8_enabled, quant_conv_same
from patchrefinerv2_tpu.registry import MODELS
from tests.test_models import tiny_config


def test_quant_conv_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 32, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(16) * 0.01, jnp.float32)
    ref = np.asarray(_conv_same(x, k, b))
    out = np.asarray(quant_conv_same(x, k, b))
    # symmetric int8 on gaussian data: relative L2 error ~1% of the
    # activation scale; assert a loose 3% bound on the normalized error
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.03, f"int8 conv error {err:.4f}"
    assert out.dtype == np.float32


def test_quant_conv_per_channel_scales():
    """A kernel with wildly different per-channel magnitudes must not lose
    the small channels to one global scale."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = np.ones((3, 3, 4, 2), np.float32)
    k[..., 0] *= 100.0
    k[..., 1] *= 0.01
    ref = np.asarray(_conv_same(x, jnp.asarray(k), None))
    out = np.asarray(quant_conv_same(x, jnp.asarray(k), None))
    for c in range(2):
        err = np.linalg.norm(out[..., c] - ref[..., c]) / np.linalg.norm(ref[..., c])
        assert err < 0.03, f"channel {c} error {err:.4f}"


def test_int8_flag_gating(monkeypatch):
    monkeypatch.delenv("PRV2_INT8", raising=False)
    monkeypatch.delenv("PRV2_INT8_FORCE", raising=False)
    assert not int8_enabled(jnp.bfloat16)
    monkeypatch.setenv("PRV2_INT8", "1")
    assert int8_enabled(jnp.bfloat16)
    # f32 is the TRAINING dtype: quantization there would silently zero
    # the conv gradients, so the flag must not bite outside 2-byte infer
    assert not int8_enabled(jnp.float32)
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    assert int8_enabled(jnp.float32)  # test override
    monkeypatch.delenv("PRV2_INT8_FORCE")
    # the fused kernels' test flag must NOT lift the int8 dtype gate
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    assert not int8_enabled(jnp.float32)
    monkeypatch.delenv("PRV2_FUSED_FORCE")
    monkeypatch.setenv("PRV2_INT8", "0")
    assert not int8_enabled(jnp.float32)


def test_int8_infer_close_to_f32(monkeypatch):
    model = MODELS.build(dict(type="PatchRefinerPlus", config=tiny_config()))
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    image_lr = jnp.asarray(rng.rand(1, 84, 112, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 168, 224, 3), jnp.float32)

    monkeypatch.delenv("PRV2_INT8", raising=False)
    d_f32, _ = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=2)

    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")  # tiny model infers in f32
    type(model)._jitted_infer.cache_clear()  # env flags bind at trace
    d_i8, _ = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=2)
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")
    type(model)._jitted_infer.cache_clear()

    d_f32, d_i8 = np.asarray(d_f32), np.asarray(d_i8)
    assert np.isfinite(d_i8).all()
    assert d_i8.shape == d_f32.shape
    # depth maps agree to int8-rounding accumulation error, not exactly
    rel = np.abs(d_i8 - d_f32) / np.maximum(np.abs(d_f32), 1e-3)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))
    assert not np.array_equal(d_i8, d_f32)  # the int8 path actually ran


def test_doubleconv_int8_and_layout(monkeypatch):
    """DoubleConv keeps the nn.Conv param tree (Conv_0/Conv_1, kernel only)
    and its int8 path stays within the quantization error bound."""
    import flax.linen as nn  # noqa: F401
    from patchrefinerv2_tpu.models.blocks.convs import DoubleConv

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    mod = DoubleConv(features=8, mid_features=12)
    monkeypatch.delenv("PRV2_INT8", raising=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"Conv_0", "Conv_1"}
    assert set(v["params"]["Conv_0"].keys()) == {"kernel"}
    assert v["params"]["Conv_0"]["kernel"].shape == (3, 3, 8, 12)
    ref = np.asarray(mod.apply(v, x))

    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    out = np.asarray(mod.apply(v, x))
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert 0 < err < 0.05, f"int8 DoubleConv error {err:.4f}"


def test_mbconv_int8_and_layout(monkeypatch):
    """The refiner-encoder MBConv pointwise convs (the per-patch FLOP bulk)
    keep the nn.Conv param tree (conv_pw/conv_pwl, kernel only) and take
    the int8 path under PRV2_INT8 within the quantization error bound."""
    from patchrefinerv2_tpu.models.backbones.encoders import MBConv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    mod = MBConv(out_ch=8, kernel=3, stride=1, expand=4, se_reduced=None)
    monkeypatch.delenv("PRV2_INT8", raising=False)
    v = mod.init(jax.random.PRNGKey(0), x, False)
    assert set(v["params"]["conv_pw"].keys()) == {"kernel"}
    assert v["params"]["conv_pw"]["kernel"].shape == (1, 1, 8, 32)
    assert set(v["params"]["conv_pwl"].keys()) == {"kernel"}
    assert v["params"]["conv_pwl"]["kernel"].shape == (1, 1, 32, 8)
    ref = np.asarray(mod.apply(v, x, False))

    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    out = np.asarray(mod.apply(v, x, False))
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert 0 < err < 0.05, f"int8 MBConv error {err:.4f}"


def test_quant_conv_bf16(monkeypatch):
    """bf16 is the real serving dtype: int8 conv must return bf16 and stay
    within the (bf16-rounded) quantization bound, with PRV2_INT8 alone
    (no FORCE override)."""
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.delenv("PRV2_INT8_FORCE", raising=False)
    assert int8_enabled(jnp.bfloat16)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.bfloat16)
    ref = np.asarray(_conv_same(x, k, None), np.float32)
    out_j = quant_conv_same(x, k, None)
    assert out_j.dtype == jnp.bfloat16
    out = np.asarray(out_j, np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.05, f"bf16 int8 conv error {err:.4f}"
