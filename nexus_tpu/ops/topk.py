"""Brute-force maximum-inner-product top-k retrieval — the Faiss replacement.

TPU-first design (reference role: Faiss IndexFlatIP / IVFFlat search,
Nexus/inference/utils.py:8-27, evaluation/text_retrieval/utils.py:148-229):

- the corpus is streamed through the MXU in blocks with `lax.scan`, keeping
  VMEM/HBM pressure at [B, block] instead of materializing [B, N] scores;
- a running top-k is merged per block (lax.top_k over 2k candidates);
- for multi-chip corpora, `sharded_topk` shards the corpus over a mesh axis,
  computes local top-k per chip, and merges with one all_gather over ICI —
  no host round-trips.

All shapes static; k and block_size are compile-time constants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _merge_topk(vals_a, idx_a, vals_b, idx_b, k: int):
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_vals, top_pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, top_pos, axis=-1)


@partial(jax.jit, static_argnames=("k", "block_size", "impl"))
def brute_force_topk(queries: Array, corpus: Array, k: int, block_size: int = 8192,
                     impl: str = "exact"):
    """Top-k inner-product search over a streamed corpus.

    Args:
        queries: [B, D]
        corpus:  [N, D]
        k:       number of neighbors
        block_size: corpus rows scored per scan step (MXU tile budget)
        impl: 'exact' (lax.top_k per block) or 'approx' (lax.approx_max_k —
            the TPU-native partial-reduce top-k; per-block recall_target 0.95,
            the cross-block running merge stays exact)

    Returns:
        (scores [B, k], indices [B, k] int32). Padded rows (when N % block
        != 0) can never win: they score -inf.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    block_size = min(block_size, max(n, 1))
    n_blocks = -(-n // block_size)
    n_pad = n_blocks * block_size
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    blocks = corpus.reshape(n_blocks, block_size, d)

    init_vals = jnp.full((b, k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((b, k), jnp.int32)

    def step(carry, inp):
        vals, idx = carry
        block_id, block = inp
        scores = jnp.dot(queries, block.T, preferred_element_type=jnp.float32)
        base = block_id * block_size
        local_ids = base + jax.lax.broadcasted_iota(jnp.int32, (b, block_size), 1)
        valid = local_ids < n
        scores = jnp.where(valid, scores, -jnp.inf)
        blk_k = min(k, block_size)
        if impl == "approx":
            top_vals, top_pos = jax.lax.approx_max_k(scores, blk_k, recall_target=0.95)
        else:
            top_vals, top_pos = jax.lax.top_k(scores, blk_k)
        top_ids = jnp.take_along_axis(local_ids, top_pos, axis=-1)
        return _merge_topk(vals, idx, top_vals, top_ids, k), None

    (vals, idx), _ = jax.lax.scan(step, (init_vals, init_idx), (jnp.arange(n_blocks), blocks))
    return vals, idx


def topk_over_corpus(queries: Array, corpus: Array, k: int, block_size: int = 8192):
    """Alias with numpy-friendly output (device arrays; call .tolist() on host)."""
    return brute_force_topk(queries, corpus, k=k, block_size=block_size)


def sharded_topk(queries: Array, corpus_shard: Array, k: int, axis_name: str, shard_offset: Array):
    """Per-device local top-k + cross-chip merge, for use inside shard_map.

    `corpus_shard` is this device's rows; `shard_offset` the global index of
    its first row. Returns replicated global (scores, indices).
    """
    vals, idx = brute_force_topk(queries, corpus_shard, k=k)
    idx = idx + shard_offset
    all_vals = jax.lax.all_gather(vals, axis_name, axis=-1, tiled=True)
    all_idx = jax.lax.all_gather(idx, axis_name, axis=-1, tiled=True)
    top_vals, top_pos = jax.lax.top_k(all_vals, k)
    return top_vals, jnp.take_along_axis(all_idx, top_pos, axis=-1)
