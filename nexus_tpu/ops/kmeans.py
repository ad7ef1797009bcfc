"""On-device k-means (parity target: the `kmeans` util the reference samplers
use, Nexus/modules/sampler.py:13-39 — reimplemented for XLA).

Fixed-iteration Lloyd's algorithm: distance matrix on the MXU, assignment via
argmin, centroid update via segment sums. Empty clusters are re-seeded from
random data points each iteration. Runs under jit with static `k`/`max_iter`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _assign(X: Array, C: Array, block: int = 262144) -> Array:
    # ||x-c||² = ||x||² - 2 x·c + ||c||²; ||x||² constant for argmin.
    # Blocked over rows (clamped dynamic slices, no padded copy of X) so the
    # [N, K] distance matrix never materializes (5M x 1024 f32 = 20 GB).
    n = X.shape[0]
    Cf = C.astype(jnp.float32)
    csq = jnp.sum(Cf * Cf, axis=-1)[None, :]
    if n <= block:
        dist = -2.0 * (X.astype(jnp.float32) @ Cf.T) + csq
        return jnp.argmin(dist, axis=-1)
    n_blocks = -(-n // block)

    def body(i, out):
        start = jnp.minimum(i * block, n - block)
        xb = jax.lax.dynamic_slice_in_dim(X, start, block).astype(jnp.float32)
        a = jnp.argmin(-2.0 * (xb @ Cf.T) + csq, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(out, a, start, axis=0)

    return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((n,), jnp.int32))


def kmeans(key: jax.Array, X: Array, k: int, max_iter: int = 30):
    """Cluster rows of ``X`` [N, D] into ``k`` clusters.

    Returns (centers [k, D], assignment [N] int32).
    """
    n = X.shape[0]
    perm = jax.random.permutation(key, n)
    C0 = X[perm[: k]]

    def body(i, C):
        assign = _assign(X, C)
        counts = jax.ops.segment_sum(jnp.ones((n,), X.dtype), assign, num_segments=k)
        sums = jax.ops.segment_sum(X, assign, num_segments=k)
        C_new = sums / jnp.maximum(counts, 1.0)[:, None]
        # reseed empty clusters from random points (new draw each iteration)
        reseed = X[jax.random.randint(jax.random.fold_in(key, i), (k,), 0, n)]
        return jnp.where((counts < 0.5)[:, None], reseed, C_new)

    C = jax.lax.fori_loop(0, max_iter, body, C0)
    return C, _assign(X, C).astype(jnp.int32)
