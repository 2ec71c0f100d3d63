"""Model zoo. Importing this module registers all model factories."""

from patchrefinerv2_tpu.models import losses  # noqa: F401
from patchrefinerv2_tpu.models import losses_extra  # noqa: F401
from patchrefinerv2_tpu.models.blocks import refiner, fusion, guided_fusion  # noqa: F401
from patchrefinerv2_tpu.models import patchrefinerplus  # noqa: F401
from patchrefinerv2_tpu.models import patchrefiner  # noqa: F401
from patchrefinerv2_tpu.models import patchrefiner_semi  # noqa: F401
from patchrefinerv2_tpu.models import patchfusion  # noqa: F401
from patchrefinerv2_tpu.models import baseline_pretrain  # noqa: F401
