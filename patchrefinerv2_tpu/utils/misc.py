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


def log_env(cfg=None):
    import jaxlib

    print_log(f"jax {jax.__version__} jaxlib {jaxlib.__version__}")
    print_log(f"devices: {jax.devices()}")
    print_log(f"process {jax.process_index()}/{jax.process_count()}")
    if cfg is not None:
        print_log(f"config: {getattr(cfg, '_filename_', '<dict>')}")
