"""Item index build + search — the Faiss-file replacement
(parity: Nexus/inference/utils.py:8-50 gen_item_index / gen_i2i_index).

An index is (vectors on device, ids, optional IVF coarse quantizer).
- Flat search = streaming matmul+top-k (ops.topk), exact.
- IVF search = kmeans coarse quantizer (nlist clusters), probe `nprobe`
  lists via a dense padded cluster layout — the two-stage TPU analog of
  Faiss IVFFlat(nlist=100, IP).
Serialization is .npz (replaces the binary faiss file + item_ids.npy pair).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.ops.kmeans import kmeans
from nexus_tpu.ops.topk import brute_force_topk


@dataclass
class ItemIndex:
    vectors: jnp.ndarray  # [N, D]
    item_ids: np.ndarray  # [N]
    metric: str = "ip"  # 'ip' | 'l2' | 'cosine'
    # IVF state (optional)
    centroids: Optional[jnp.ndarray] = None  # [nlist, D]
    cluster_items: Optional[jnp.ndarray] = None  # [nlist, maxlen] row indices
    cluster_counts: Optional[jnp.ndarray] = None  # [nlist]
    nprobe: int = 10

    @property
    def is_ivf(self) -> bool:
        return self.centroids is not None

    # -- build -------------------------------------------------------------

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        item_ids: Optional[np.ndarray] = None,
        metric: str = "ip",
        index_type: str = "flat",
        nlist: int = 100,
        nprobe: int = 10,
        seed: int = 0,
    ) -> "ItemIndex":
        vectors = jnp.asarray(vectors, jnp.float32)
        if metric == "cosine":
            vectors = vectors / jnp.clip(jnp.linalg.norm(vectors, axis=-1, keepdims=True), 1e-12, None)
        if item_ids is None:
            item_ids = np.arange(vectors.shape[0])
        idx = cls(vectors=vectors, item_ids=np.asarray(item_ids), metric=metric, nprobe=nprobe)
        if index_type == "ivf":
            from nexus_tpu.modules.sampler import build_padded_cluster_index

            key = jax.random.PRNGKey(seed)
            nlist = min(nlist, vectors.shape[0])
            centroids, assign = kmeans(key, vectors, nlist, max_iter=20)
            items, counts, _ = build_padded_cluster_index(assign, nlist)
            idx.centroids = centroids
            idx.cluster_items = items
            idx.cluster_counts = counts
        return idx

    # -- search ------------------------------------------------------------

    def _prep_queries(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries, jnp.float32)
        if self.metric == "cosine":
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        return q

    def search(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores [B, k], item_ids [B, k])."""
        q = self._prep_queries(queries)
        if self.metric == "l2":
            # exact L2 via the IP kernel on augmented vectors:
            # argmin ||q-v||² == argmax (q·v - ||v||²/2)
            sq = jnp.sum(self.vectors**2, axis=-1, keepdims=True) / 2.0
            aug_vec = jnp.concatenate([self.vectors, -sq], axis=-1)
            aug_q = jnp.concatenate([q, jnp.ones((q.shape[0], 1))], axis=-1)
            scores, rows = brute_force_topk(aug_q, aug_vec, k=k)
        elif self.is_ivf:
            scores, rows = self._ivf_search(q, k)
        else:
            scores, rows = brute_force_topk(q, self.vectors, k=k)
        return np.asarray(scores), self.item_ids[np.asarray(rows)]

    def _ivf_search(self, q: jnp.ndarray, k: int):
        """Jit-compiled IVF search (arrays passed as arguments — closing the
        corpus into the program as a constant stalls XLA compilation)."""
        key = ("ivf", k, min(self.nprobe, self.centroids.shape[0]))
        cache = self.__dict__.setdefault("_compiled", {})
        if key not in cache:
            cache[key] = jax.jit(
                partial(_ivf_search_impl, k=k, nprobe=key[2])
            )
        return cache[key](q, self.vectors, self.centroids, self.cluster_items, self.cluster_counts)

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = {
            "vectors": np.asarray(self.vectors),
            "item_ids": self.item_ids,
            "metric": np.asarray(self.metric),
            "nprobe": np.asarray(self.nprobe),
        }
        if self.is_ivf:
            arrays.update(
                centroids=np.asarray(self.centroids),
                cluster_items=np.asarray(self.cluster_items),
                cluster_counts=np.asarray(self.cluster_counts),
            )
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "ItemIndex":
        data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
        idx = cls(
            vectors=jnp.asarray(data["vectors"]),
            item_ids=data["item_ids"],
            metric=str(data["metric"]),
            nprobe=int(data["nprobe"]),
        )
        if "centroids" in data:
            idx.centroids = jnp.asarray(data["centroids"])
            idx.cluster_items = jnp.asarray(data["cluster_items"])
            idx.cluster_counts = jnp.asarray(data["cluster_counts"])
        return idx


def gen_item_index(
    item_vectors_path_or_array, index_path: str, item_ids_path: Optional[str] = None,
    index_type: str = "ivf", nlist: int = 100, nprobe: int = 10,
) -> ItemIndex:
    """Build + persist the item index (parity: inference/utils.py:8-27)."""
    if isinstance(item_vectors_path_or_array, str):
        p = item_vectors_path_or_array
        vectors = np.load(p) if p.endswith((".npy", ".npz")) else np.load(p, allow_pickle=True)
    else:
        vectors = np.asarray(item_vectors_path_or_array)
    index = ItemIndex.build(vectors, index_type=index_type, nlist=nlist, nprobe=nprobe)
    index.save(index_path)
    if item_ids_path:
        np.save(item_ids_path, index.item_ids)
    return index


def gen_i2i_index(
    item_vectors, kv_store, topk: int = 10, key_template: str = "i2i:{}",
    batch_size: int = 1024,
) -> None:
    """Precompute per-item top-k neighbor lists into a KV store
    (parity: inference/utils.py:29-50)."""
    vectors = jnp.asarray(item_vectors, jnp.float32)
    n = vectors.shape[0]
    for off in range(0, n, batch_size):
        block = vectors[off : off + batch_size]
        _, ids = brute_force_topk(block, vectors, k=topk + 1)
        ids = np.asarray(ids)
        for i in range(block.shape[0]):
            item = off + i
            neighbors = [int(x) for x in ids[i] if int(x) != item][:topk]
            kv_store.set(key_template.format(item), ",".join(map(str, neighbors)))

def _ivf_search_impl(q, vectors, centroids, items, counts, *, k: int, nprobe: int):
    """Probe the nprobe nearest coarse cells, scoring one cell per scan step
    with a running top-k merge — peak memory is one [B, maxlen, D] gather
    instead of all probed cells at once."""
    cscores = q @ centroids.T  # [B, nlist]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, P]
    b = q.shape[0]
    m = items.shape[1]
    k_eff = min(k, m)

    def step(carry, pi):
        vals, idx = carry
        cells = probe[:, pi]  # [B]
        rows = items[cells]  # [B, m]
        vecs = vectors[rows]  # [B, m, D]
        scores = jnp.einsum("bd,bmd->bm", q, vecs).astype(jnp.float32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
        scores = jnp.where(slot < counts[cells][:, None], scores, -jnp.inf)
        top_s, top_pos = jax.lax.top_k(scores, k_eff)
        top_rows = jnp.take_along_axis(rows, top_pos, axis=-1)
        all_s = jnp.concatenate([vals, top_s], axis=-1)
        all_i = jnp.concatenate([idx, top_rows], axis=-1)
        best_s, best_pos = jax.lax.top_k(all_s, k_eff)
        return (best_s, jnp.take_along_axis(all_i, best_pos, axis=-1)), None

    init = (
        jnp.full((b, k_eff), -jnp.inf, jnp.float32),
        jnp.zeros((b, k_eff), jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(step, init, jnp.arange(nprobe))
    return vals, rows
