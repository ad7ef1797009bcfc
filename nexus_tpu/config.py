"""Dataclass-based configuration system.

Behavioral parity with the reference config layer (Nexus/abc/arguments.py:11-197):
- ``AbsArguments`` dataclasses load from dict / JSON / YAML,
- ``from_dict`` recursively coerces values to the annotated field types
  (including nested ``AbsArguments`` subclasses, Optional/Union, list/tuple),
- JSON/YAML loading resolves relative paths against the config file's
  directory for a known allowlist of path-like keys.

This file is an original implementation written for nexus_tpu.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from dataclasses import dataclass, fields
from pathlib import Path
from typing import Any, Union, get_args, get_origin

import yaml

logger = logging.getLogger(__name__)

# Keys whose string values are always local filesystem paths and should be
# resolved relative to the directory the config file lives in.
DEFINITE_LOCAL_PATH_KEYS = {
    "train_data",
    "eval_data",
    "output_dir",
    "dataset_dir",
    "media_root",
    "image_root",
    "video_root",
    "cache_path",
    "cache_dir",
    "corpus_embd_save_dir",
    "eval_output_dir",
    "eval_output_path",
    "checkpoint_dir",
    "item_vectors_path",
}

# Keys that may be either a local path or a remote reference (e.g. an HF hub
# id). Only resolved when the value clearly looks like a relative local path.
MAYBE_LOCAL_OR_REMOTE_KEYS = {
    "model_name_or_path",
    "processor_name_or_path",
    "embedder_name_or_path",
    "reranker_name_or_path",
}


def _is_remote(value: str) -> bool:
    return "://" in value


def _resolve_path(value: str, base_dir: Path, force: bool) -> str:
    """Resolve ``value`` against ``base_dir`` if it is a relative local path."""
    if value in (None, ""):
        return value
    expanded = os.path.expanduser(value)
    if os.path.isabs(expanded) or _is_remote(expanded):
        return expanded
    if not force:
        # Ambiguous key (may be an HF model id): only resolve when it is
        # explicitly relative ("./x", "../x") or actually exists on disk.
        candidate = base_dir / expanded
        explicit = expanded.startswith(".")
        if not explicit and not candidate.exists():
            return value
    return str((base_dir / expanded).resolve())


def resolve_config_paths(config: dict, base_dir: Path) -> dict:
    """Return a copy of ``config`` with path-like values made absolute."""
    out = dict(config)
    for key, value in out.items():
        if value in (None, ""):
            continue
        if key in DEFINITE_LOCAL_PATH_KEYS:
            if isinstance(value, list):
                out[key] = [_resolve_path(v, base_dir, force=True) for v in value]
            elif isinstance(value, str):
                out[key] = _resolve_path(value, base_dir, force=True)
        elif key in MAYBE_LOCAL_OR_REMOTE_KEYS and isinstance(value, str):
            out[key] = _resolve_path(value, base_dir, force=False)
    return out


def init_argument(annotation: Any, value: Any) -> Any:
    """Coerce ``value`` to the type described by ``annotation``.

    Handles None, Any, Optional/Union (first member that works wins),
    nested AbsArguments subclasses (dicts), list/tuple element coercion,
    and scalar conversion with a warning when a cast actually changes type.
    """
    if value is None:
        return None
    if annotation in (Any, object, dataclasses.MISSING, None):
        return value

    origin = get_origin(annotation)
    args = get_args(annotation)

    if origin is Union:
        for member in args:
            if member is type(None):
                continue
            try:
                return init_argument(member, value)
            except (TypeError, ValueError):
                continue
        raise TypeError(f"cannot coerce {value!r} ({type(value).__name__}) to {annotation}")

    if isinstance(value, dict):
        from_dict = getattr(annotation, "from_dict", None)
        if callable(from_dict):
            return from_dict(value)
        return dict(value)

    if origin in (list, tuple):
        item_t = args[0] if args else Any
        items = [init_argument(item_t, v) for v in value]
        return items if origin is list else tuple(items)
    if isinstance(value, (list, tuple)) and annotation in (list, tuple):
        return annotation(value)
    if isinstance(value, list):
        return list(value)

    if isinstance(annotation, type) and isinstance(value, annotation):
        return value
    try:
        coerced = annotation(value)
    except (TypeError, ValueError) as e:
        raise TypeError(
            f"cannot coerce {value!r} ({type(value).__name__}) to {annotation}"
        ) from e
    logger.debug("config coerce: %r (%s) -> %r (%s)", value, type(value).__name__, coerced, type(coerced).__name__)
    return coerced


@dataclass
class AbsArguments:
    """Base class for all argument dataclasses (reference: Nexus/abc/arguments.py:130)."""

    @classmethod
    def from_dict(cls, d: dict) -> "AbsArguments":
        known = {f.name: f.type for f in fields(cls)}
        # Resolve string annotations (``from __future__ import annotations``).
        import typing

        hints = None
        kwargs = {}
        extra = {}
        for key, value in d.items():
            if key not in known:
                extra[key] = value
                continue
            annotation = known[key]
            if isinstance(annotation, str):
                if hints is None:
                    hints = typing.get_type_hints(cls)
                annotation = hints.get(key, Any)
            kwargs[key] = init_argument(annotation, value)
        obj = cls(**kwargs)
        if extra:
            logger.debug("%s ignoring unknown config keys: %s", cls.__name__, sorted(extra))
            # Keep unknown keys reachable for duck-typed consumers.
            object.__setattr__(obj, "_extra", extra)
        return obj

    @classmethod
    def from_json(cls, path: str) -> "AbsArguments":
        path = os.path.expanduser(path)
        with open(path) as f:
            d = json.load(f)
        return cls.from_dict(resolve_config_paths(d, Path(path).resolve().parent))

    @classmethod
    def from_yaml(cls, path: str) -> "AbsArguments":
        path = os.path.expanduser(path)
        with open(path) as f:
            d = yaml.safe_load(f)
        return cls.from_dict(resolve_config_paths(d, Path(path).resolve().parent))

    @classmethod
    def from_file(cls, path: str) -> "AbsArguments":
        if path.endswith((".yaml", ".yml")):
            return cls.from_yaml(path)
        return cls.from_json(path)

    def to_dict(self) -> dict:
        def convert(x):
            if isinstance(x, AbsArguments):
                return x.to_dict()
            if dataclasses.is_dataclass(x) and not isinstance(x, type):
                return dataclasses.asdict(x)
            if isinstance(x, dict):
                return {k: convert(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return [convert(v) for v in x]
            return x

        return {f.name: convert(getattr(self, f.name)) for f in fields(self)}

    def to_json(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    def to_yaml(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f)


def load_config_file(path: str) -> dict:
    """Load a raw JSON/YAML config dict with path resolution (engine configs)."""
    path = os.path.expanduser(path)
    with open(path) as f:
        d = yaml.safe_load(f) if path.endswith((".yaml", ".yml")) else json.load(f)
    return resolve_config_paths(d, Path(path).resolve().parent)
