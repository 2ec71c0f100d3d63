from patchrefinerv2_tpu.ops.resize import resize, resize_nchw_like_torch  # noqa: F401
from patchrefinerv2_tpu.ops.roi_align import roi_align  # noqa: F401
from patchrefinerv2_tpu.ops.masks import generate_blend_mask  # noqa: F401
from patchrefinerv2_tpu.ops.blend import TileBlender  # noqa: F401
