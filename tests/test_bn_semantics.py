"""BN-under-DP semantics (`convert_syncbn`, parallel/bn.py).

The reference trains per-GPU BatchNorm by default and SyncBN only when the
config sets convert_syncbn=True (configs/patchrefiner_zoedepth_offline_
pesudo/pr_ssi_midas_cs.py:121). Under GSPMD the naive batch mean is a
global reduction (implicit SyncBN), so the grouped path must restore
per-shard moments. These tests pin:

* GroupedBatchNorm(groups=1) == nn.BatchNorm exactly (output + stat update)
* GroupedBatchNorm(groups=G) == per-group nn.BatchNorm applied shard-wise
* groups_for() resolves the flag against the mesh
* the grouped path runs (and differs from global) under the 8-CPU mesh
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from patchrefinerv2_tpu.parallel.bn import (
    GroupedBatchNorm,
    bn_groups,
    groups_for,
    set_bn_groups,
)


def _data(n=8, h=4, w=5, c=3, seed=0):
    return np.random.RandomState(seed).randn(n, h, w, c).astype(np.float32) * 2 + 1


def _run_flax_bn(x):
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mut = bn.apply(variables, x, mutable=["batch_stats"])
    return y, mut["batch_stats"]


def _run_grouped(x, groups):
    bn = GroupedBatchNorm(groups=groups, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mut = bn.apply(variables, x, mutable=["batch_stats"])
    return y, mut["batch_stats"]


def test_groups1_matches_flax_batchnorm():
    x = _data()
    y_ref, stats_ref = _run_flax_bn(x)
    y, stats = _run_grouped(x, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               np.asarray(stats_ref["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               np.asarray(stats_ref["var"]), atol=1e-6)


def test_grouped_equals_per_shard_batchnorm():
    g = 4
    x = _data(n=8)
    y, stats = _run_grouped(x, g)
    # reference semantics: each shard normalized with its own moments
    parts, means, variances = [], [], []
    for xs in np.split(x, g, axis=0):
        ys, st = _run_flax_bn(xs)
        parts.append(np.asarray(ys))
        means.append(np.asarray(st["mean"]))
        variances.append(np.asarray(st["var"]))
    np.testing.assert_allclose(np.asarray(y), np.concatenate(parts, 0), atol=1e-5)
    # running stats update with the across-group mean of group moments
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               np.mean(means, axis=0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               np.mean(variances, axis=0), atol=1e-6)


def test_grouped_differs_from_global_on_heterogeneous_batch():
    x = _data(n=8, seed=3)
    x[4:] += 10.0  # make shard statistics genuinely different
    y_global, _ = _run_grouped(x, 1)
    y_shard, _ = _run_grouped(x, 4)
    assert float(np.max(np.abs(np.asarray(y_global) - np.asarray(y_shard)))) > 0.1


def test_groups_for_resolution():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()).reshape(8)
    mesh = Mesh(devs, ("data",))
    assert groups_for({"convert_syncbn": True}, mesh) == 1
    assert groups_for({"convert_syncbn": False}, mesh) == 8
    assert groups_for({}, mesh) == 8  # reference default: per-GPU BN
    assert groups_for({}, None) == 1


def test_bn_callsite_picks_grouped_under_mesh():
    """_BN routes to GroupedBatchNorm when groups>1 and shares the
    nn.BatchNorm variable tree (checkpoint compatibility)."""
    from patchrefinerv2_tpu.models.backbones.encoders import _BN

    x = jnp.asarray(_data(n=8, c=6, seed=5))
    mod = _BN(eps=1e-5)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    assert "BatchNorm_0" in variables["params"]

    set_bn_groups(8)
    try:
        y8, mut8 = mod.apply(variables, x, True, mutable=["batch_stats"])
        set_bn_groups(1)
        y1, mut1 = mod.apply(variables, x, True, mutable=["batch_stats"])
    finally:
        set_bn_groups(1)
    # same variable tree, different normalization semantics
    assert mut8["batch_stats"].keys() == mut1["batch_stats"].keys()
    assert float(jnp.max(jnp.abs(y8 - y1))) > 0 or np.allclose(
        np.asarray(x).std(axis=(1, 2)), np.asarray(x).std())
    # eval mode is group-free: identical either way
    set_bn_groups(8)
    try:
        ye8 = mod.apply(variables, x, False)
        set_bn_groups(1)
        ye1 = mod.apply(variables, x, False)
    finally:
        set_bn_groups(1)
    np.testing.assert_allclose(np.asarray(ye8), np.asarray(ye1))


def test_grouped_bn_under_jit_mesh():
    """The grouped path jits over the 8-device data mesh and matches the
    eager per-shard computation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()).reshape(8)
    mesh = Mesh(devs, ("data",))
    x = _data(n=16, seed=7)
    bn = GroupedBatchNorm(groups=8, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def f(v, xb):
        return bn.apply(v, xb, mutable=["batch_stats"])

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y, _ = f(variables, xs)

    parts = []
    for xg in np.split(x, 8, axis=0):
        yg, _ = _run_flax_bn(xg)
        parts.append(np.asarray(yg))
    np.testing.assert_allclose(np.asarray(y), np.concatenate(parts, 0),
                               atol=1e-5)
