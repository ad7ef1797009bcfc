"""Structured logging helpers (replaces the reference's loguru usage)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"
_configured = False


def get_logger(name: str = "nexus_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("nexus_tpu")
        if not root.handlers:
            root.addHandler(handler)
        root.setLevel(logging.INFO)
        _configured = True
    return logging.getLogger(name)


def log_dict(logger: logging.Logger, d: dict, prefix: str = "") -> None:
    """Log a flat dict of metrics on one line (reference: modules/arguments.py:167)."""
    items = ", ".join(f"{k}={_fmt(v)}" for k, v in d.items())
    logger.info("%s%s", f"{prefix} " if prefix else "", items)


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return v
