"""Batch-size bucketing for serving paths.

Every compiled program is specialized on its input shapes; a dynamically
micro-batched service produces arbitrary boarded batch sizes (1, 2, 3, ...),
and compiling one program per size through a remote compiler is a
multi-second stall each (measured: concurrent /search p50 collapsed from
~150 ms to 6-12 s purely from per-size compile storms — bench_serving.py
`concurrent`, round 4). Padding the batch dimension up to a power-of-two
bucket caps the number of distinct programs at log2(max_batch) while
wasting < 2x compute on the worst boarded size.
"""

from __future__ import annotations

from typing import Optional


def batch_bucket(n: int, cap: Optional[int] = None) -> int:
    """Smallest power of two >= n (minimum 1), capped at ``cap`` if given.
    For n above the cap, returns n unchanged (large offline batches are
    already fixed-size; only the small dynamic sizes need coalescing)."""
    if n <= 0:
        return 1
    b = 1
    while b < n:
        b <<= 1
    if cap is not None and b > cap:
        return n if n > cap else cap
    return b


def pad_rows(arr, target: int):
    """Pad a numpy array's leading dim up to ``target`` rows (repeat-free
    zero padding); no-op when already there."""
    import numpy as np

    n = arr.shape[0]
    if n >= target:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def pad_tree_rows(tree, target: int):
    """pad_rows over a (possibly nested) dict of arrays."""
    import numpy as np

    if isinstance(tree, dict):
        return {k: pad_tree_rows(v, target) for k, v in tree.items()}
    return pad_rows(np.asarray(tree), target)
