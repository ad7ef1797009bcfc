"""Pytree/batch utilities.

`split_batch` mirrors the reference's context/sequence/item feature split
(Nexus/modules/arguments.py:146) that every recommendation model's forward
relies on; here batches are plain pytrees of jnp arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def batch_to_device(batch: Any, device=None) -> Any:
    """Move a (possibly nested) batch of numpy arrays onto a jax device."""
    def put(x):
        if isinstance(x, (np.ndarray, jnp.ndarray)):
            return jax.device_put(x, device)
        return x

    return jax.tree_util.tree_map(put, batch)


def split_batch(batch: Dict[str, Any], data_attr) -> tuple[dict, dict, dict]:
    """Split a flat feature dict into (context, sequence, item) sub-dicts.

    ``data_attr`` is a DataAttr4Model with ``context_features``,
    ``item_features`` and ``seq_features`` name lists. Sequence features come
    in as nested dicts keyed by sequence name.
    """
    context, seqs, items = {}, {}, {}
    seq_names = set(getattr(data_attr, "seq_features", {}) or {})
    for key, value in batch.items():
        if key in seq_names or (isinstance(value, dict) and key.startswith("seq")):
            seqs[key] = value
        elif key in (data_attr.context_features or []):
            context[key] = value
        elif key in (data_attr.item_features or []):
            items[key] = value
    return context, seqs, items


def tree_stack(trees: Sequence[Any]):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def tree_concat(trees: Sequence[Any], axis: int = 0):
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)
