"""Every shipped config must parse through the mmengine-compatible reader
and build its model graph (SURVEY.md §5.6: the reference's config surface
is the north-star API; a config that stops building is a regression)."""

import glob
import os

import pytest

from patchrefinerv2_tpu.config import Config
from patchrefinerv2_tpu.registry import build_model

ROOT = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, "configs", "**", "*.py"), recursive=True)
)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, ROOT) for p in CONFIGS]
)
def test_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    if "model" in cfg:
        model = build_model(cfg.model)
        assert model is not None
    # fragments (optim bases, dataset bases) just need to parse
