from patchrefinerv2_tpu.utils.logging import print_log  # noqa: F401
from patchrefinerv2_tpu.utils.runner import RunnerInfo  # noqa: F401
from patchrefinerv2_tpu.utils.misc import fix_random_seed  # noqa: F401
