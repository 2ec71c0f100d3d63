"""Force tests onto CPU with a virtual 8-device mesh (TPU-native substitute
for a distributed test story; SURVEY.md section 4).

The environment's python startup hook registers a real-TPU jax backend in
every process, so the usual ``XLA_FLAGS=--xla_force_host_platform_device_
count=8`` env route is ineffective — tests would silently run on ONE device
and never exercise the mesh (this masked a real uneven-batch sharding bug
and a degenerate LR-schedule NaN). Route that works: flip ``jax_platforms``
and ``jax_num_cpu_devices`` through jax.config BEFORE any backend query
(querying first locks the initialized backend), then verify loudly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

from jax._src import xla_bridge as _xb

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    # a backend was already initialized (e.g. by another plugin) — tear it
    # down and retry once
    _xb._clear_backends()
    jax.config.update("jax_num_cpu_devices", 8)

if jax.device_count() != 8 or jax.devices()[0].platform != "cpu":
    raise RuntimeError(
        f"virtual 8-device CPU mesh not active (got {jax.device_count()} "
        f"{jax.devices()[0].platform} devices) — multi-chip tests would "
        "silently run single-device"
    )

# persistent compilation cache: repeated test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/prv2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
