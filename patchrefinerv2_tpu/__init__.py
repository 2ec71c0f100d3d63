"""PatchRefinerV2-TPU: a TPU-native (JAX/XLA/Pallas) high-resolution metric depth
estimation framework with the capabilities of zhyever/PatchRefinerV2.

Reference behavior is documented per-module with citations into the upstream
repository (``/root/reference``); the implementation here is a from-scratch
TPU-first design (NHWC layouts, static shapes, batched patch inference,
scatter-add tile blending, pjit data parallelism).
"""

__version__ = "0.1.0"

from patchrefinerv2_tpu.registry import MODELS, DATASETS  # noqa: F401
from patchrefinerv2_tpu.config import Config  # noqa: F401
