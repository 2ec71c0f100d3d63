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
    # a stray generic force flag must NOT lift the int8 dtype gate
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    assert not int8_enabled(jnp.float32)
    monkeypatch.delenv("PRV2_FUSED_FORCE")
    monkeypatch.setenv("PRV2_INT8", "0")
    assert not int8_enabled(jnp.float32)


@pytest.mark.slow
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
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")  # tiny convs: lift the gate
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "0")  # tiny spatial: lift the r5 gate
    type(model)._jitted_infer.cache_clear()  # env flags bind at trace
    d_i8, _ = model.infer(variables, image_lr, image_hr, cai_mode="m1", process_num=2)
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")
    type(model)._jitted_infer.cache_clear()

    d_f32a, d_i8 = np.asarray(d_f32), np.asarray(d_i8)
    assert np.isfinite(d_i8).all()
    assert d_i8.shape == d_f32a.shape
    # depth maps agree to int8-rounding accumulation error, not exactly
    rel = np.abs(d_i8 - d_f32a) / np.maximum(np.abs(d_f32a), 1e-3)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))
    assert not np.array_equal(d_i8, d_f32a)  # the int8 path actually ran

    # static (calibrated) leg: quant_scales flows through the jitted scan
    # program + the _infer_variables cast, and stays close to the exact
    # graph. Shares this test's compiled f32 baseline (a separate e2e
    # would re-pay two full tiny-model compiles on CPU).
    monkeypatch.delenv("PRV2_INT8", raising=False)
    cal_vars = model.calibrate_int8(variables, [(image_lr, image_hr)],
                                    process_num=2)
    assert "quant_scales" in cal_vars
    assert len(jax.tree_util.tree_leaves(cal_vars["quant_scales"])) > 0
    assert "quant_kq" in cal_vars  # pre-quantized weights served as vars
    assert any(
        getattr(l, "dtype", None) == jnp.int8
        for l in jax.tree_util.tree_leaves(cal_vars["quant_kq"])
    )
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")  # tiny convs: lift the gate
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "0")  # tiny spatial: lift the r5 gate
    type(model)._jitted_infer.cache_clear()
    d_st, _ = model.infer(cal_vars, image_lr, image_hr, cai_mode="m1",
                          process_num=2)
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")
    monkeypatch.delenv("PRV2_INT8_MIN_KC")
    type(model)._jitted_infer.cache_clear()
    d_st = np.asarray(d_st)
    assert np.isfinite(d_st).all()
    rel = np.abs(d_st - d_f32a) / np.maximum(np.abs(d_f32a), 1e-3)
    assert float(np.median(rel)) < 0.05, float(np.median(rel))
    assert not np.array_equal(d_st, d_f32a)


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
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")  # tiny convs: lift the gate
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "0")  # tiny spatial: lift the r5 gate
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
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")  # tiny convs: lift the gate
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "0")  # tiny spatial: lift the r5 gate
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


def test_calibrated_static_scales_unit(monkeypatch):
    """Calibration sows per-site activation abs-max under the module's own
    scope; serving with the folded quant_scales collection quantizes
    against the calibrated grid. For the FIRST conv the calibration batch
    and the serving batch see the same input, so static == dynamic
    bit-for-bit there; downstream convs see slightly different inputs
    (calibration runs the exact graph) so the whole-module outputs only
    agree to quantization-grid tolerance."""
    from patchrefinerv2_tpu.models.blocks.convs import DoubleConv, SingleConvCNNLN
    from patchrefinerv2_tpu.ops.quant import scales_from_stats

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)

    # single conv: static == dynamic exactly on the calibration batch
    single = SingleConvCNNLN(8)
    monkeypatch.delenv("PRV2_INT8", raising=False)
    vs = single.init(jax.random.PRNGKey(1), x)
    monkeypatch.setenv("PRV2_INT8_CALIB", "1")
    _, stats1 = single.apply(vs, x, mutable=["quant_stats"])
    monkeypatch.delenv("PRV2_INT8_CALIB")
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")  # tiny convs: lift the gate
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "0")  # tiny spatial: lift the r5 gate
    out_dyn1 = np.asarray(single.apply(vs, x))
    out_st1 = np.asarray(single.apply(
        {**vs, "quant_scales": scales_from_stats([stats1["quant_stats"]])}, x))
    np.testing.assert_array_equal(out_st1, out_dyn1)
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")

    mod = DoubleConv(features=8, mid_features=12)
    v = mod.init(jax.random.PRNGKey(0), x)

    # calibration pass: exact conv + sown stats
    monkeypatch.setenv("PRV2_INT8_CALIB", "1")
    out_calib, stats = mod.apply(v, x, mutable=["quant_stats"])
    monkeypatch.delenv("PRV2_INT8_CALIB")
    ref = np.asarray(mod.apply(v, x))
    np.testing.assert_array_equal(np.asarray(out_calib), ref)
    leaves = jax.tree_util.tree_leaves(stats["quant_stats"])
    # two convs in DoubleConv x (per-tensor qamax + per-channel qcamax)
    assert len(leaves) == 4
    assert all(float(np.max(np.asarray(l))) > 0 for l in leaves)

    # serving: static result close to both the exact and the dynamic graphs
    scales = scales_from_stats([stats["quant_stats"]])
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    out_dyn = np.asarray(mod.apply(v, x))
    out_static = np.asarray(mod.apply({**v, "quant_scales": scales}, x))
    np.testing.assert_allclose(out_static, out_dyn, rtol=0, atol=0.05)
    err = np.linalg.norm(out_static - ref) / np.linalg.norm(ref)
    assert 0 < err < 0.05


def test_prequantized_weights_kq(monkeypatch):
    """Calibration sows pre-quantized (int8 kernel, per-channel scale)
    pairs into ``quant_kq``; serving with them must match the in-graph
    weight quantization BIT-EXACTLY (same kernel, same grid) while the
    served executable no longer re-quantizes weights per call."""
    from patchrefinerv2_tpu.models.blocks.convs import DoubleConv
    from patchrefinerv2_tpu.ops.quant import scales_from_stats

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    mod = DoubleConv(features=8, mid_features=12)
    monkeypatch.delenv("PRV2_INT8", raising=False)
    v = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("PRV2_INT8_CALIB", "1")
    _, st = mod.apply(v, x, mutable=["quant_stats", "quant_kq"])
    monkeypatch.delenv("PRV2_INT8_CALIB")
    kq_leaves = jax.tree_util.tree_leaves(st["quant_kq"])
    assert any(l.dtype == jnp.int8 for l in kq_leaves)

    scales = scales_from_stats([st["quant_stats"]])
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")
    out_static = np.asarray(mod.apply({**v, "quant_scales": scales}, x))
    out_kq = np.asarray(mod.apply(
        {**v, "quant_scales": scales, "quant_kq": st["quant_kq"]}, x))
    np.testing.assert_array_equal(out_kq, out_static)

    # legacy calibration call (quant_stats only mutable) must still work:
    # the quant_kq sow silently no-ops on the immutable collection
    monkeypatch.setenv("PRV2_INT8_CALIB", "1")
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")
    _, st2 = mod.apply(v, x, mutable=["quant_stats"])
    monkeypatch.delenv("PRV2_INT8_CALIB")
    assert "quant_stats" in st2 and "quant_kq" not in st2


def test_perchan_static_mode(monkeypatch):
    """Per-input-channel static int8 (PRV2_INT8_PERCHAN): the folded-weight
    serving path must match the in-graph fold bit-exactly, and the
    per-channel grid must be at least as accurate as per-tensor on a
    channel-skewed input."""
    from patchrefinerv2_tpu.models.blocks.convs import DoubleConv
    from patchrefinerv2_tpu.models.blocks.dpt import _conv_same
    from patchrefinerv2_tpu.ops.quant import (
        quant_conv_same, quant_conv_same_perchan, scales_from_stats,
    )

    rng = np.random.RandomState(3)
    # channel-skewed activations (channel c scaled by 4^c) with inversely
    # scaled weights: every channel contributes equally to the output, so
    # a per-tensor activation grid (set by the loudest channel) destroys
    # the small channels' share while per-channel grids keep all of them
    x = rng.randn(1, 16, 16, 6) * (4.0 ** np.arange(6))
    x = jnp.asarray(x, jnp.float32)
    k = rng.randn(3, 3, 6, 8) * 0.1 / (4.0 ** np.arange(6))[None, None, :, None]
    k = jnp.asarray(k, jnp.float32)
    ref = np.asarray(_conv_same(x, k, None))
    amax_t = jnp.max(jnp.abs(x))
    amax_c = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    err_t = np.linalg.norm(np.asarray(quant_conv_same(x, k, None, x_amax=amax_t)) - ref)
    err_c = np.linalg.norm(np.asarray(quant_conv_same_perchan(x, k, None, amax_c)) - ref)
    assert err_c < err_t * 0.5, (err_c, err_t)  # much tighter grid here

    # dispatch flow: stats pass -> fold -> finalize pass (sows kqc) ->
    # perchan serving; with-kqc == without-kqc bit-exact
    mod = DoubleConv(features=8, mid_features=12)
    monkeypatch.delenv("PRV2_INT8", raising=False)
    x2 = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x2)
    monkeypatch.setenv("PRV2_INT8_CALIB", "1")
    _, st = mod.apply(v, x2, mutable=["quant_stats", "quant_kq"])
    scales = scales_from_stats([st["quant_stats"]])
    _, st2 = mod.apply({**v, "quant_scales": scales}, x2,
                       mutable=["quant_stats", "quant_kq"])
    monkeypatch.delenv("PRV2_INT8_CALIB")
    kq_leaves = jax.tree_util.tree_flatten_with_path(st2["quant_kq"])[0]
    assert any("kqc" in jax.tree_util.keystr(p) for p, _ in kq_leaves)

    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")
    monkeypatch.setenv("PRV2_INT8_PERCHAN", "1")
    out_kqc = np.asarray(mod.apply(
        {**v, "quant_scales": scales, "quant_kq": st2["quant_kq"]}, x2))
    out_fold = np.asarray(mod.apply({**v, "quant_scales": scales}, x2))
    np.testing.assert_array_equal(out_kqc, out_fold)
    # and still close to the exact conv
    monkeypatch.delenv("PRV2_INT8")
    monkeypatch.delenv("PRV2_INT8_FORCE")
    monkeypatch.delenv("PRV2_INT8_PERCHAN")
    exact = np.asarray(mod.apply(v, x2))
    err = np.linalg.norm(out_kqc - exact) / np.linalg.norm(exact)
    assert err < 0.05, err


def test_s2d_quant_conv_bit_exact_vs_plain_quant():
    """d2s(quant_conv(s2d(x), s2d_kernel(k))) == quant_conv(x, k) EXACTLY:
    the expanded kernel's structural zeros quantize to 0, its per-cout
    abs-max equals the plain kernel's, and the int32 accumulation sums the
    same int8 products — so quantizing the s2d form (PRV2_INT8_S2D) adds
    NO error over the plain int8 conv."""
    from patchrefinerv2_tpu.ops import s2d as s2d_ops

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 5), jnp.float32)

    plain = quant_conv_same(x, k, None)
    xs = s2d_ops.space_to_depth(x)
    ks = s2d_ops.s2d_same_kernel(k)
    got = s2d_ops.depth_to_space(quant_conv_same(xs, ks, None))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain))


def test_min_hw_gate(monkeypatch):
    """PRV2_INT8_MIN_HW gates small-spatial inputs back to the exact conv."""
    monkeypatch.setenv("PRV2_INT8", "1")
    monkeypatch.setenv("PRV2_INT8_FORCE", "1")
    monkeypatch.setenv("PRV2_INT8_MIN_KC", "0")
    monkeypatch.setenv("PRV2_INT8_MIN_HW", "1000")
    from patchrefinerv2_tpu.models.blocks.convs import DoubleConv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)  # 64 px < 1000
    m = DoubleConv(features=4)
    v = m.init(jax.random.PRNGKey(0), x)
    gated = m.apply(v, x)
    monkeypatch.setenv("PRV2_INT8", "0")
    exact = m.apply(v, x)
    # below the spatial floor the quant path must NOT engage
    np.testing.assert_array_equal(np.asarray(gated), np.asarray(exact))
