"""Dataset registry imports."""

from patchrefinerv2_tpu.datasets import u4k  # noqa: F401
from patchrefinerv2_tpu.datasets import general  # noqa: F401
from patchrefinerv2_tpu.datasets import synthetic  # noqa: F401
from patchrefinerv2_tpu.datasets import cityscapes  # noqa: F401
from patchrefinerv2_tpu.datasets import kitti  # noqa: F401
from patchrefinerv2_tpu.datasets import scannet  # noqa: F401
from patchrefinerv2_tpu.datasets import eth3d  # noqa: F401
