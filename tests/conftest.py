"""Force tests onto CPU with a virtual 8-device mesh (TPU-native substitute
for a distributed test story; SURVEY.md section 4)."""

import os

# hard override: the surrounding environment exports JAX_PLATFORMS=axon
# (real TPU); tests must run on deterministic f32 CPU with a virtual mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: repeated test runs skip XLA recompiles
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prv2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
