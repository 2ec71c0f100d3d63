"""Tile blending: scatter-add accumulation of patch predictions into canvases.

TPU-native replacement for the reference's host-side ``RunningAverageMap``
(estimator/models/utils.py:22-49) + mosaic scatter loops
(estimator/models/baseline_pretrain.py:347-375). The reference moves canvases
to CPU and updates them patch-by-patch with the incremental weighted-average
formula ``avg = (p*w + count*avg) / (count + w)``. That recurrence maintains
exactly ``avg = (sum of w_i * p_i) / (sum of w_i)`` and ``count = sum w_i``
(including the init pass, whose mosaic is written unweighted with
count = blur_mask), so we keep three HBM canvases instead:

* ``mosaic``  — unweighted init-pass patch placement (what pure-m1 returns,
  models/utils.py:45-49),
* ``sum_wp``  — sum of mask-weighted predictions over all passes,
* ``sum_w``   — sum of masks.

``finalize`` = ``where(sum_w > 0, sum_wp / sum_w, mosaic)``, algebraically
identical to the reference for every cai mode. Patch updates use sequential
``dynamic_update_slice`` under ``lax.scan`` — overlapping random patches
compose correctly because weighted averaging is associative.

``resize`` replicates the reference rN quirk (models/utils.py:38-43): the
average map resizes with *nearest* (torch default) while the count map
resizes bilinear+align_corners=True.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.ops.resize import resize

__all__ = ["TileBlender", "BlendState"]


class BlendState(NamedTuple):
    mosaic: jnp.ndarray  # (H, W)
    sum_wp: jnp.ndarray  # (H, W)
    sum_w: jnp.ndarray  # (H, W)


class TileBlender:
    """Stateless namespace of functional blend operations."""

    @staticmethod
    def init(shape: tuple[int, int], dtype=jnp.float32) -> BlendState:
        z = jnp.zeros(shape, dtype)
        return BlendState(z, z, z)

    @staticmethod
    def add_pass(
        state: BlendState,
        preds: jnp.ndarray,  # (N, h, w)
        mask: jnp.ndarray,  # (h, w) blur mask shared by the pass
        starts: jnp.ndarray,  # (N, 2) int32 [h_start, w_start]
        init_pass: bool = False,
        valid: jnp.ndarray | None = None,  # (N,) 0/1 — padded patches get 0
        initv: jnp.ndarray | None = None,  # (N,) 0/1 — per-patch mosaic write
    ) -> BlendState:
        """``init_pass`` marks the whole call's patches as init (static);
        ``initv`` marks patches individually — used by the unified regular
        stream (tiling.merge_all_passes), where one scan carries both the
        init pass and the shifted passes."""
        mask = mask.astype(state.sum_w.dtype)
        if valid is None:
            valid = jnp.ones((preds.shape[0],), state.sum_w.dtype)
        per_patch_init = initv is not None and not init_pass
        if initv is None:
            initv = jnp.full(
                (preds.shape[0],), 1.0 if init_pass else 0.0, state.sum_w.dtype
            )

        def body(carry, inp):
            mosaic, swp, sw = carry
            p, st, v, iv = inp
            p = p.astype(swp.dtype)
            m = mask * v
            cur_wp = jax.lax.dynamic_slice(swp, st, p.shape)
            cur_w = jax.lax.dynamic_slice(sw, st, p.shape)
            swp = jax.lax.dynamic_update_slice(swp, cur_wp + p * m, st)
            sw = jax.lax.dynamic_update_slice(sw, cur_w + m, st)
            if init_pass:
                mosaic = jax.lax.dynamic_update_slice(mosaic, p, st)
            elif per_patch_init:
                cur_m = jax.lax.dynamic_slice(mosaic, st, p.shape)
                mosaic = jax.lax.dynamic_update_slice(
                    mosaic, jnp.where(iv > 0, p, cur_m), st
                )
            return (mosaic, swp, sw), None

        (mosaic, swp, sw), _ = jax.lax.scan(
            body,
            (state.mosaic, state.sum_wp, state.sum_w),
            (preds, starts.astype(jnp.int32), valid.astype(state.sum_w.dtype),
             initv.astype(state.sum_w.dtype)),
        )
        return BlendState(mosaic, swp, sw)

    @staticmethod
    def resize(state: BlendState, shape: tuple[int, int]) -> BlendState:
        """Collapse + resize at the m2 -> rN boundary (raw-resolution switch)."""
        avg = TileBlender.finalize(state)
        avg_r = resize(avg[None, :, :, None], shape, mode="nearest")[0, :, :, 0]
        sum_w_r = resize(
            state.sum_w[None, :, :, None], shape, mode="bilinear", align_corners=True
        )[0, :, :, 0]
        return BlendState(avg_r, avg_r * sum_w_r, sum_w_r)

    @staticmethod
    def finalize(state: BlendState) -> jnp.ndarray:
        return jnp.where(state.sum_w > 0, state.sum_wp / jnp.maximum(state.sum_w, 1e-12), state.mosaic)
