"""Type-tag registries mapping config ``type='...'`` strings to factories.

Mirrors the role of the reference's MMEngine registries
(estimator/registry/registry.py:7-8) without the MMEngine dependency: the
config surface keeps nested ``dict(type='X', ...)`` nodes and ``build``
resolves them against the registered factory table.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict


class Registry:
    """A plain name -> factory table with lazy module import locations."""

    def __init__(self, name: str, locations: tuple[str, ...] = ()):
        self.name = name
        self._table: Dict[str, Callable] = {}
        self._locations = locations
        self._imported = False

    def register_module(self, name: str | None = None, module: Callable | None = None):
        def _register(obj: Callable):
            key = name or obj.__name__
            if key in self._table and self._table[key] is not obj:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._table[key] = obj
            return obj

        if module is not None:
            return _register(module)
        return _register

    def _ensure_imported(self):
        if not self._imported:
            self._imported = True
            for loc in self._locations:
                importlib.import_module(loc)

    def get(self, key: str) -> Callable:
        self._ensure_imported()
        if key not in self._table:
            raise KeyError(
                f"{key!r} is not registered in {self.name}. "
                f"Available: {sorted(self._table)}"
            )
        return self._table[key]

    def build(self, cfg: Dict[str, Any], **extra) -> Any:
        """Instantiate from a ``dict(type='Name', **kwargs)`` node."""
        if cfg is None:
            return None
        cfg = dict(cfg)
        type_name = cfg.pop("type")
        factory = self.get(type_name) if isinstance(type_name, str) else type_name
        cfg.update(extra)
        return factory(**cfg)

    def __contains__(self, key: str) -> bool:
        self._ensure_imported()
        return key in self._table


MODELS = Registry("models", locations=("patchrefinerv2_tpu.models",))
DATASETS = Registry("datasets", locations=("patchrefinerv2_tpu.datasets",))


def build_model(cfg, **extra):
    return MODELS.build(cfg, **extra)


def build_dataset(cfg, **extra):
    return DATASETS.build(cfg, **extra)
