"""Misc run utilities (estimator/utils/misc.py equivalents).

JAX is deterministic under fixed PRNG keys, so ``fix_random_seed`` only
seeds the host-side python/numpy generators used by data augmentation
(misc.py:61-70; the cudnn knobs have no TPU analog). ``log_env`` dumps the
environment like misc.py:73-96.
"""

from __future__ import annotations

import random

import jax
import numpy as np

from patchrefinerv2_tpu.utils.logging import print_log


def fix_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def setup_distributed():
    """Multi-host runtime init (the reference's setup_env/init_dist NCCL
    analog, estimator/utils/dist.py:6-43). TPU pod slices discover their
    peers through the TPU runtime, but ``jax.distributed.initialize()``
    is still required for cross-host coordination (orbax multihost
    checkpoint barriers, process_allgather over DCN, GPU/CPU clusters).
    Opt-in: fires when the standard coordination env is present
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS) or PRV2_DIST=1 —
    single-process runs stay untouched."""
    import os

    if (
        os.environ.get("PRV2_DIST")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or (os.environ.get("WORLD_SIZE") and os.environ.get("MASTER_ADDR"))
    ):
        # torchrun-style env (the reference's launcher contract,
        # estimator/utils/dist.py:6-43 via mmengine init_dist): when
        # MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE are set, pass them
        # explicitly — jax's auto-detection only covers SLURM/MPI-style
        # clusters. Exercised end-to-end by tools/dryrun_multiprocess.py.
        kwargs = {}
        if os.environ.get("WORLD_SIZE") and os.environ.get("MASTER_ADDR"):
            kwargs = dict(
                coordinator_address=(
                    f"{os.environ['MASTER_ADDR']}:"
                    f"{os.environ.get('MASTER_PORT', '29500')}"
                ),
                num_processes=int(os.environ["WORLD_SIZE"]),
                process_id=int(os.environ.get("RANK", "0")),
            )
        # must run before ANY backend query (jax.devices/process_count),
        # so callers invoke this first thing after import
        try:
            jax.distributed.initialize(**kwargs)
            print_log(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
        except Exception as e:  # pragma: no cover - env-specific
            print_log(f"jax.distributed.initialize failed: {e}")


def log_env(cfg=None):
    import jaxlib

    print_log(f"jax {jax.__version__} jaxlib {jaxlib.__version__}")
    print_log(f"devices: {jax.devices()}")
    print_log(f"process {jax.process_index()}/{jax.process_count()}")
    if cfg is not None:
        print_log(f"config: {getattr(cfg, '_filename_', '<dict>')}")


def rescale_tensor(x, low: float = 0.0, high: float = 1.0):
    """Min-max rescale into [low, high] (misc.py:98-121)."""
    import numpy as np

    x = np.asarray(x, np.float32)
    span = x.max() - x.min()
    if span <= 0:
        return np.full_like(x, low)
    return (x - x.min()) / span * (high - low) + low


def rescale_tensor_train(x, low: float = 0.0, high: float = 1.0):
    """jnp variant usable inside jitted losses."""
    import jax.numpy as jnp

    span = jnp.max(x) - jnp.min(x)
    scaled = (x - jnp.min(x)) / jnp.maximum(span, 1e-12) * (high - low) + low
    return jnp.where(span > 0, scaled, jnp.full_like(x, low))
