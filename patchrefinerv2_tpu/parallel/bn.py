"""BatchNorm semantics under the data mesh (`convert_syncbn`).

The reference trains with per-GPU BatchNorm by default and converts to
SyncBN only when the config sets ``convert_syncbn=True`` (every
patchrefiner_zoedepth_{offline,online}_pesudo recipe does, e.g.
/root/reference/configs/patchrefiner_zoedepth_offline_pesudo/
pr_ssi_midas_cs.py:121; train.py:141-144 wraps with
``nn.SyncBatchNorm.convert_sync_batchnorm``).

Under GSPMD the naive ``jnp.mean`` over a batch sharded across the mesh's
'data' axis is a GLOBAL reduction — implicitly SyncBN — which silently
inverts the reference default. This module restores both semantics:

* ``convert_syncbn=True``  -> bn groups = 1: global batch moments (the
  GSPMD default). This is exact SyncBN.
* ``convert_syncbn=False`` -> bn groups = mesh 'data' size: the batch is
  reshaped to a leading (groups, n/groups) axis aligned with the batch
  sharding and moments are taken per group — each device's sub-batch gets
  its own statistics, matching per-GPU BN.

Running statistics: torch DDP keeps independent per-replica running stats
and checkpoints rank 0's; here the running stats are updated with the
across-group mean of the group moments (a deliberate, documented
divergence — a single canonical stat stream instead of rank 0's arbitrary
one; identical in expectation for iid shards).

The group count is a trace-time static, set by the Trainer before the
train step is jitted (``set_bn_groups``), NOT a traced value.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_GROUPS = 1


def set_bn_groups(g: int) -> None:
    """Set the number of BN statistic groups (1 = global/SyncBN)."""
    global _GROUPS
    _GROUPS = max(1, int(g))


def bn_groups() -> int:
    return _GROUPS


def groups_for(config, mesh) -> int:
    """Resolve the group count from a train config + mesh: SyncBN (1) when
    ``convert_syncbn`` is True, else the mesh's 'data' axis size so each
    data shard normalizes with its own moments (reference per-GPU BN)."""
    if config is not None and bool(config.get("convert_syncbn", False)):
        return 1
    if mesh is None:
        return 1
    return int(mesh.shape.get("data", 1))


class GroupedBatchNorm(nn.Module):
    """Training-mode BatchNorm with per-group batch statistics.

    Variable layout is identical to ``nn.BatchNorm`` (params: scale/bias,
    batch_stats: mean/var), so call sites can pick between this and
    ``nn.BatchNorm`` by the trace-time group count without forking the
    checkpoint tree. Like flax, the running update uses the biased
    variance and ``ra = momentum * ra + (1 - momentum) * batch``.
    """

    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        n = x.shape[0]
        g = self.groups if self.groups > 1 and n % self.groups == 0 else 1
        xf = x.astype(jnp.float32)
        xg = xf.reshape((g, n // g) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))  # all but group + channel
        gmean = jnp.mean(xg, axis=axes)  # (g, C)
        gvar = jnp.maximum(
            jnp.mean(xg * xg, axis=axes) - gmean * gmean, 0.0)
        bshape = (g,) + (1,) * (xg.ndim - 2) + (c,)
        y = (xg - gmean.reshape(bshape)) * jax.lax.rsqrt(
            gvar.reshape(bshape) + self.epsilon)
        y = y.reshape(x.shape) * scale + bias

        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value
                + (1.0 - self.momentum) * gmean.mean(axis=0))
            ra_var.value = (
                self.momentum * ra_var.value
                + (1.0 - self.momentum) * gvar.mean(axis=0))
        # same output dtype rule as nn.BatchNorm(dtype=None): promote input
        # with the f32 params
        return y.astype(jnp.promote_types(x.dtype, jnp.float32))
