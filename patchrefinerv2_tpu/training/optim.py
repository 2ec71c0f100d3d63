"""Optimizer construction from reference-style configs.

Maps the MMEngine ``optim_wrapper`` + ``param_scheduler`` surface
(configs/patchrefinerv2_zoedepth/v2_eff_u4k.py:138-157) onto optax:

* AdamW with global-norm clipping (clip_grad.max_norm),
* OneCycle LR (torch.optim.lr_scheduler.OneCycleLR, cos anneal,
  trainer/trainer.py:39-42) == optax.cosine_onecycle_schedule,
* cycled momentum: AdamW b1 max->base->max mirroring cycle_momentum,
* ``paramwise_cfg.custom_keys`` prefix lr_mult applied as a per-leaf
  update scale (reference prefixes are translated to this framework's
  param tree: refiner_fine_branch->fine, refiner_fusion_model->fusion,
  coarse_branch->coarse),
* frozen subtrees (e2e_training=False coarse branch) get zero updates.

decay_mult other than 1.0 never appears in live reference configs and is
not implemented (documented divergence).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

_PREFIX_MAP = {
    "refiner_fine_branch.refiner_encoder": ("fine", "refiner_encoder"),
    "refiner_fine_branch": ("fine",),
    "refiner_fusion_model": ("fusion",),
    "coarse_branch": ("coarse",),
}


def _path_lr_mult(path: tuple[str, ...], custom_keys: dict) -> float:
    for key, spec in custom_keys.items():
        mapped = _PREFIX_MAP.get(key)
        if mapped is None:
            mapped = tuple(key.split("."))
        if path[: len(mapped)] == mapped:
            return float(spec.get("lr_mult", 1.0))
    return 1.0


def _cos_anneal(start, end, pct):
    """torch OneCycleLR._annealing_cos: cosine from start to end."""
    return end + (start - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * pct))


def _onecycle_phases(total_steps, pct_start):
    """torch OneCycleLR phase milestones (lr_scheduler.py: the warmup ends
    at float(pct_start*total)-1 and the anneal at total-1 — FLOAT
    milestones, not int-rounded step counts). Degenerate widths are
    clamped so few-step runs stay finite (optax's onecycle emits nan
    there; surfaced by the 8-device trainer test)."""
    total = max(float(total_steps), 1.0)
    warm_end = max(pct_start * total - 1.0, 1e-6)
    total_end = max(total - 1.0, warm_end + 1e-6)
    return warm_end, total_end


def _onecycle_lr_schedule(total_steps, peak, pct_start, div_factor, final_div_factor):
    """torch OneCycleLR (anneal_strategy='cos', trainer.py:39-42): cosine
    ramp initial->peak over the warmup phase, cosine anneal peak->final.
    Golden-tested stepwise against torch.optim.lr_scheduler.OneCycleLR."""
    warm_end, total_end = _onecycle_phases(total_steps, pct_start)
    init = peak / div_factor
    final = init / final_div_factor

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = jnp.clip(step / warm_end, 0.0, 1.0)
        down = jnp.clip((step - warm_end) / (total_end - warm_end), 0.0, 1.0)
        return jnp.where(
            step <= warm_end,
            _cos_anneal(init, peak, up),
            _cos_anneal(peak, final, down),
        )

    return sched


def _momentum_schedule(total_steps, pct_start, base_m, max_m):
    """OneCycleLR momentum (cycled inversely to lr, cosine in BOTH
    phases like torch's anneal_strategy='cos'): max -> base over warmup,
    base -> max over the anneal."""
    warm_end, total_end = _onecycle_phases(total_steps, pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = jnp.clip(step / warm_end, 0.0, 1.0)
        down = jnp.clip((step - warm_end) / (total_end - warm_end), 0.0, 1.0)
        return jnp.where(
            step <= warm_end,
            _cos_anneal(max_m, base_m, up),
            _cos_anneal(base_m, max_m, down),
        )

    return sched


def build_optimizer(
    optim_cfg: dict,
    scheduler_cfg: dict,
    total_steps: int,
    params,
    frozen_prefixes: tuple[tuple[str, ...], ...] = (),
):
    """Returns (optax.GradientTransformation, lr_schedule_fn)."""
    opt = optim_cfg.get("optimizer", {})
    max_lr = float(opt.get("lr", 1e-4))
    wd = float(opt.get("weight_decay", 0.01))
    pct_start = float(scheduler_cfg.get("pct_start", 0.3))
    div_factor = float(scheduler_cfg.get("div_factor", 25.0))
    final_div_factor = float(scheduler_cfg.get("final_div_factor", 1e4))
    cycle_momentum = bool(scheduler_cfg.get("cycle_momentum", False))
    base_m = float(scheduler_cfg.get("base_momentum", 0.85))
    max_m = float(scheduler_cfg.get("max_momentum", 0.95))

    lr_schedule = _onecycle_lr_schedule(
        total_steps, max_lr, pct_start, div_factor, final_div_factor
    )

    custom_keys = optim_cfg.get("paramwise_cfg", {}).get("custom_keys", {})

    def leaf_scale(path) -> float:
        spath = tuple(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        for fp in frozen_prefixes:
            if spath[: len(fp)] == fp:
                return 0.0
        return _path_lr_mult(spath, custom_keys)

    scales = jax.tree_util.tree_map_with_path(lambda p, _: leaf_scale(p), params)

    chain = [optax.clip_by_global_norm(float(optim_cfg.get("clip_grad", {}).get("max_norm", 1e9)))]
    if cycle_momentum:
        m_sched = _momentum_schedule(total_steps, pct_start, base_m, max_m)
        chain.append(
            optax.inject_hyperparams(
                lambda b1, learning_rate: optax.adamw(
                    learning_rate=learning_rate, b1=b1, weight_decay=wd
                )
            )(b1=m_sched, learning_rate=lr_schedule)
        )
    else:
        chain.append(optax.adamw(learning_rate=lr_schedule, weight_decay=wd))
    tx = optax.chain(*chain)

    # apply per-leaf lr_mult / freezing as a final update scale
    def scale_updates(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    scale_tx = optax.GradientTransformation(lambda _: optax.EmptyState(), scale_updates)
    return optax.chain(tx, scale_tx), lr_schedule
