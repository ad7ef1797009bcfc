"""Name -> class registries for reflective model/module lookup.

Parity with the reference's dynamic class lookup (`get_modules`/`get_model_cls`,
Nexus/modules/arguments.py:107-126) used by checkpoint `from_pretrained` to
reconstruct a model class from its name stored in model_config.json.
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict, Type


class Registry:
    """A simple string -> object registry with decorator registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, object] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            if key in self._entries and self._entries[key] is not obj:
                raise KeyError(f"{self.kind} registry: duplicate entry {key!r}")
            self._entries[key] = obj
            return obj

        return deco

    def add(self, name: str, obj) -> None:
        self._entries[name] = obj

    def get(self, name: str):
        try:
            return self._entries[name]
        except KeyError:
            raise KeyError(
                f"{self.kind} registry has no entry {name!r}; known: {sorted(self._entries)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self):
        return sorted(self._entries)


MODEL_REGISTRY = Registry("model")
register_model = MODEL_REGISTRY.register


_MODULE_SEARCH_PATHS = [
    "nexus_tpu.training.reranker.recommendation.modeling",
    "nexus_tpu.training.embedder.recommendation.modeling",
    "nexus_tpu.modules",
]


def get_model_cls(name: str) -> Type:
    """Look up a model class by name: registry first, then module scan.

    Mirrors the reference behavior where `model_config.json` stores only the
    class name and `from_pretrained` resolves it reflectively
    (Nexus/training/embedder/recommendation/modeling.py:265-300).
    """
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY.get(name)
    for module_name in _MODULE_SEARCH_PATHS:
        try:
            mod = importlib.import_module(module_name)
        except ImportError:
            continue
        if hasattr(mod, name):
            return getattr(mod, name)
    raise KeyError(f"model class {name!r} not found in registry or search paths")
