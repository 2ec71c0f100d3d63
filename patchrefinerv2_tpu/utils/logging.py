"""Console logging (mmengine.print_log equivalent)."""

from __future__ import annotations

import logging
import sys

_logger = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        _logger = logging.getLogger("patchrefinerv2_tpu")
        if not _logger.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(
                logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
            )
            _logger.addHandler(h)
            _logger.setLevel(logging.INFO)
            _logger.propagate = False
    return _logger


def print_log(msg: str, level: int = logging.INFO):
    get_logger().log(level, msg)
