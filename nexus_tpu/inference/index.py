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
    vectors: jnp.ndarray  # [N, D] (f32/bf16, or int8 when row_scales is set)
    item_ids: np.ndarray  # [N]
    metric: str = "ip"  # 'ip' | 'l2' | 'cosine'
    # IVF state (optional)
    centroids: Optional[jnp.ndarray] = None  # [n_subcells, D]
    cluster_items: Optional[jnp.ndarray] = None  # [n_subcells] start row in the reordered corpus
    cluster_counts: Optional[jnp.ndarray] = None  # [n_subcells] rows in subcell (<= cell_cap)
    nprobe: int = 10
    cell_cap: int = 0  # subcell row capacity (static slice size)
    topk_impl: str = "exact"  # 'exact' | 'approx' (lax.approx_max_k per step)
    # int8 cell storage: vectors are symmetric per-row quantized, row i
    # dequantizes as vectors[i] * row_scales[i] (4x HBM saving — what fits
    # 12.5M x 768 on one 16 GB chip); scores scale AFTER the int8 matmul
    row_scales: Optional[jnp.ndarray] = None  # [N] f32

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
        dtype=jnp.float32,
        kmeans_train_size: int = 262144,
        storage: str = "dense",  # 'dense' | 'int8' (per-row symmetric quant)
        centroids: Optional[np.ndarray] = None,  # skip k-means when provided
    ) -> "ItemIndex":
        vectors = jnp.asarray(vectors).astype(dtype)
        if metric == "cosine":
            vectors = vectors / jnp.clip(
                jnp.linalg.norm(vectors.astype(jnp.float32), axis=-1, keepdims=True), 1e-12, None
            ).astype(dtype)
        if item_ids is None:
            item_ids = np.arange(vectors.shape[0])
        idx = cls(vectors=vectors, item_ids=np.asarray(item_ids), metric=metric, nprobe=nprobe)
        if index_type == "ivf":
            from nexus_tpu.ops.kmeans import _assign

            key = jax.random.PRNGKey(seed)
            n = vectors.shape[0]
            nlist = min(nlist, n)
            if centroids is None:
                # Faiss-style: train centroids on a sample, then assign everything
                if n > kmeans_train_size:
                    sample_rows = jax.random.choice(key, n, (kmeans_train_size,), replace=False)
                    train_vecs = vectors[sample_rows].astype(jnp.float32)
                else:
                    train_vecs = vectors.astype(jnp.float32)
                centroids, _ = kmeans(key, train_vecs, nlist, max_iter=20)
            else:
                centroids = jnp.asarray(centroids, jnp.float32)
                nlist = centroids.shape[0]
            assign = np.asarray(jax.jit(_assign)(vectors, centroids))
            # Cell-contiguous layout: reorder the corpus so every cell is a
            # contiguous row range, split oversized cells into capped
            # SUBCELLS sharing the centroid. Search then reads subcells with
            # full-bandwidth dynamic slices — random row gathers measured 6x
            # slower than contiguous streaming on v5e.
            cap = min(max(int(2 * n / nlist), 512), n)
            order = np.argsort(assign, kind="stable")
            sorted_assign = assign[order]
            boundaries = np.searchsorted(sorted_assign, np.arange(nlist + 1))
            sub_centroid_rows, sub_starts, sub_counts = [], [], []
            for cell in range(nlist):
                lo, hi = int(boundaries[cell]), int(boundaries[cell + 1])
                for off in range(lo, hi, cap):
                    sub_centroid_rows.append(cell)
                    sub_starts.append(off)
                    sub_counts.append(min(cap, hi - off))
            idx.vectors = vectors[jnp.asarray(order)]  # reordered corpus
            idx.item_ids = np.asarray(item_ids)[order]
            idx.centroids = jnp.asarray(np.asarray(centroids)[sub_centroid_rows], dtype)
            idx.cluster_items = jnp.asarray(np.asarray(sub_starts, np.int32))  # subcell start rows
            idx.cluster_counts = jnp.asarray(np.asarray(sub_counts, np.int32))
            idx.cell_cap = cap
        if storage == "int8":
            if not idx.is_ivf:
                raise ValueError("int8 storage requires index_type='ivf'")
            idx.vectors, idx.row_scales = _quantize_rows_int8(idx.vectors)
        return idx

    @classmethod
    def build_streamed(
        cls,
        chunk_factory,  # callable -> iterator of [n_i, D] float chunks (re-iterable)
        item_ids: Optional[np.ndarray] = None,
        metric: str = "ip",
        nlist: int = 4096,
        nprobe: int = 64,
        seed: int = 0,
        kmeans_train_size: int = 262144,
        storage: str = "int8",
        centroids: Optional[np.ndarray] = None,
        dtype=jnp.float32,
    ) -> "ItemIndex":
        """Constant-host-memory IVF build over a corpus streamed in chunks
        (the scale path: a 12.5M x 768 f32 corpus is 38 GB — neither host RAM
        nor a dense device buffer need ever hold it).

        Three streaming passes: (1) reservoir-sample k-means training rows,
        (2) assign every chunk to its cell on device, (3) quantize each chunk
        on device and scatter it into the DONATED cell-contiguous corpus
        buffer at its reordered positions (in-place XLA updates — the int8
        buffer is the only corpus-sized allocation anywhere).
        """
        rng = np.random.default_rng(seed)

        def prep(chunk):
            c = np.asarray(chunk, np.float32)
            if metric == "cosine":
                c = c / np.clip(np.linalg.norm(c, axis=-1, keepdims=True), 1e-12, None)
            return c

        # pass 1: count rows + reservoir-sample training rows
        n = 0
        sample = None
        n_sampled = 0
        if centroids is None:
            for chunk in chunk_factory():
                chunk = prep(chunk)
                if sample is None:
                    sample = np.empty((kmeans_train_size, chunk.shape[1]), np.float32)
                m = len(chunk)
                fill = min(kmeans_train_size - n_sampled, m)
                if fill > 0:
                    sample[n_sampled : n_sampled + fill] = chunk[:fill]
                    n_sampled += fill
                if fill < m:  # vectorized reservoir acceptance for the rest
                    gpos = n + np.arange(fill, m)
                    take = np.nonzero(rng.random(m - fill) < kmeans_train_size / (gpos + 1))[0]
                    slots = rng.integers(0, kmeans_train_size, len(take))
                    sample[slots] = chunk[fill + take]
                n += m
            key = jax.random.PRNGKey(seed)
            cents, _ = kmeans(key, jnp.asarray(sample[:n_sampled]), min(nlist, n_sampled),
                              max_iter=20)
            centroids = np.asarray(cents)
        else:
            centroids = np.asarray(centroids, np.float32)
            for chunk in chunk_factory():
                n += np.asarray(chunk).shape[0]
        nlist = centroids.shape[0]
        cents_dev = jnp.asarray(centroids, jnp.float32)

        # pass 2: assign every chunk
        from nexus_tpu.ops.kmeans import _assign

        assign_fn = jax.jit(_assign)
        assign = np.empty((n,), np.int32)
        off = 0
        for chunk in chunk_factory():
            chunk = prep(chunk)
            assign[off : off + len(chunk)] = np.asarray(assign_fn(jnp.asarray(chunk), cents_dev))
            off += len(chunk)

        # host layout: cell-contiguous order + capped subcells (same scheme
        # as build(); the reorder itself never materializes on host)
        cap = min(max(int(2 * n / nlist), 512), n)
        order = np.argsort(assign, kind="stable")
        inv = np.empty((n,), np.int64)
        inv[order] = np.arange(n)
        sorted_assign = assign[order]
        boundaries = np.searchsorted(sorted_assign, np.arange(nlist + 1))
        sub_centroid_rows, sub_starts, sub_counts = [], [], []
        for cell in range(nlist):
            lo, hi = int(boundaries[cell]), int(boundaries[cell + 1])
            for o in range(lo, hi, cap):
                sub_centroid_rows.append(cell)
                sub_starts.append(o)
                sub_counts.append(min(cap, hi - o))

        # pass 3: quantize chunks on device, scatter into the donated buffer
        quantized = storage == "int8"
        buf = jnp.zeros((n, centroids.shape[1]), jnp.int8 if quantized else dtype)
        scales = jnp.ones((n,), jnp.float32)

        if quantized:
            @partial(jax.jit, donate_argnums=(0, 1))
            def write(buf, scales, chunk, target):
                q, s = _quantize_rows_int8(chunk)
                return buf.at[target].set(q), scales.at[target].set(s)
        else:
            @partial(jax.jit, donate_argnums=(0, 1))
            def write(buf, scales, chunk, target):
                return buf.at[target].set(chunk.astype(buf.dtype)), scales

        off = 0
        for chunk in chunk_factory():
            chunk = prep(chunk)
            target = jnp.asarray(inv[off : off + len(chunk)])
            buf, scales = write(buf, scales, jnp.asarray(chunk), target)
            off += len(chunk)

        if item_ids is None:
            item_ids = np.arange(n)
        idx = cls(
            vectors=buf,
            item_ids=np.asarray(item_ids)[order],
            metric=metric,
            centroids=jnp.asarray(centroids[sub_centroid_rows], jnp.float32),
            cluster_items=jnp.asarray(np.asarray(sub_starts, np.int32)),
            cluster_counts=jnp.asarray(np.asarray(sub_counts, np.int32)),
            nprobe=nprobe,
            cell_cap=cap,
            row_scales=scales if quantized else None,
        )
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
        # batch-size bucket: one compiled program per pow-2 query count, not
        # per size — dynamic micro-batched serving boards arbitrary counts
        # (utils/buckets.py; zero-padded queries score junk rows that are
        # sliced away below)
        from nexus_tpu.utils.buckets import batch_bucket

        b = q.shape[0]
        target = batch_bucket(b, cap=1024)
        if target != b:
            q = jnp.pad(q, ((0, target - b), (0, 0)))
        if self.is_ivf and self.metric != "l2":
            scores, rows = self._ivf_search(q, k)
        else:
            scores, rows = self._flat_search(q, k)
        return (np.asarray(scores)[:b],
                self.item_ids[np.asarray(rows)[:b]])

    def search_ops(self, k: int, batch_size: int):
        """(pure_fn, operands) for composing the search INTO a caller's jit
        program (e.g. fused encode+search serving — one device dispatch).
        ``pure_fn(q, *operands) -> (scores, rows)``; operands are the index
        arrays passed as ARGUMENTS (closing them into a jit program as
        constants stalls compilation). q must already be metric-prepped
        (cosine-normalized) f32."""
        if self.is_ivf and self.metric != "l2":
            nprobe = min(self.nprobe, self.centroids.shape[0])
            max_union = min(batch_size * nprobe, self.centroids.shape[0])
            quant = self.row_scales is not None
            fn = partial(_ivf_search_impl, k=k, nprobe=nprobe, max_union=max_union,
                         cap=self.cell_cap, quantized=quant, impl=self.topk_impl)
            scales = self.row_scales if quant else jnp.ones((1,), jnp.float32)
            return fn, (self.vectors, scales, self.centroids,
                        self.cluster_items, self.cluster_counts)
        if self.metric == "l2":
            # exact L2 via the IP kernel on augmented vectors:
            # argmin ||q-v||² == argmax (q·v - ||v||²/2)
            def l2_fn(q, vectors):
                sq = jnp.sum(vectors**2, axis=-1, keepdims=True) / 2.0
                aug_vec = jnp.concatenate([vectors, -sq], axis=-1)
                aug_q = jnp.concatenate([q, jnp.ones((q.shape[0], 1))], axis=-1)
                return brute_force_topk(aug_q, aug_vec, k=k, impl=self.topk_impl)

            return l2_fn, (self.vectors,)
        return partial(brute_force_topk, k=k, impl=self.topk_impl), (self.vectors,)

    def _flat_search(self, q: jnp.ndarray, k: int):
        """Cached jit-compiled scan — ONE device dispatch per call (eager ops
        each pay full device-call latency in serving). Same program as the
        fused path: search_ops supplies the fn/operands."""
        key = ("flat", k, q.shape[0], self.metric, self.topk_impl)
        cache = self.__dict__.setdefault("_compiled", {})
        if key not in cache:
            fn, _ = self.search_ops(k, q.shape[0])
            cache[key] = jax.jit(fn)
        _, operands = self.search_ops(k, q.shape[0])
        return cache[key](q, *operands)

    def _ivf_search(self, q: jnp.ndarray, k: int):
        """Jit-compiled IVF search (arrays passed as arguments — closing the
        corpus into the program as a constant stalls XLA compilation)."""
        nprobe = min(self.nprobe, self.centroids.shape[0])
        max_union = min(q.shape[0] * nprobe, self.centroids.shape[0])
        quant = self.row_scales is not None
        key = ("ivf", k, nprobe, max_union, q.shape[0], quant, self.topk_impl)
        cache = self.__dict__.setdefault("_compiled", {})
        if key not in cache:
            cache[key] = jax.jit(
                partial(_ivf_search_impl, k=k, nprobe=nprobe, max_union=max_union,
                        cap=self.cell_cap, quantized=quant, impl=self.topk_impl)
            )
        scales = self.row_scales if quant else jnp.ones((1,), jnp.float32)
        return cache[key](q, self.vectors, scales, self.centroids,
                          self.cluster_items, self.cluster_counts)

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = {
            "vectors": np.asarray(self.vectors),
            "item_ids": self.item_ids,
            "metric": np.asarray(self.metric),
            "nprobe": np.asarray(self.nprobe),
            "cell_cap": np.asarray(self.cell_cap),
        }
        if self.is_ivf:
            arrays.update(
                centroids=np.asarray(self.centroids),
                cluster_items=np.asarray(self.cluster_items),
                cluster_counts=np.asarray(self.cluster_counts),
            )
        if self.row_scales is not None:
            arrays["row_scales"] = np.asarray(self.row_scales)
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "ItemIndex":
        data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
        idx = cls(
            vectors=jnp.asarray(data["vectors"]),
            item_ids=data["item_ids"],
            metric=str(data["metric"]),
            nprobe=int(data["nprobe"]),
            cell_cap=int(data["cell_cap"]) if "cell_cap" in data else 0,
        )
        if "centroids" in data:
            idx.centroids = jnp.asarray(data["centroids"])
            idx.cluster_items = jnp.asarray(data["cluster_items"])
            idx.cluster_counts = jnp.asarray(data["cluster_counts"])
        if "row_scales" in data:
            idx.row_scales = jnp.asarray(data["row_scales"])
        return idx


def _partition_ivf_subcells(base: "ItemIndex", n_shards: int):
    """Round-robin the base index's subcells over n_shards, re-packing each
    shard cell-contiguously (slot s*cap..s*cap+count). Returns per-shard
    (vectors, scales, GLOBAL item ids, centroids, starts, counts) arrays
    with leading shard axis — the common layout of ShardedIVFIndex (device
    shards) and TieredShardedIVFIndex (host-tiered shards)."""
    s_cells = int(base.centroids.shape[0])
    starts = np.asarray(base.cluster_items)
    counts = np.asarray(base.cluster_counts)
    vecs = np.asarray(base.vectors)
    scales = None if base.row_scales is None else np.asarray(base.row_scales)
    ids = np.asarray(base.item_ids)
    per = -(-s_cells // n_shards)
    cap = int(base.cell_cap)
    shard_vecs = np.zeros((n_shards, per * cap, vecs.shape[1]), vecs.dtype)
    shard_scales = np.zeros((n_shards, per * cap), np.float32)
    shard_ids = np.zeros((n_shards, per * cap), np.int64)
    shard_cents = np.zeros((n_shards, per, base.centroids.shape[1]),
                           np.asarray(base.centroids).dtype)
    shard_starts = np.zeros((n_shards, per), np.int32)
    shard_counts = np.zeros((n_shards, per), np.int32)
    for c in range(s_cells):
        s, slot = c % n_shards, c // n_shards
        cnt = int(counts[c])
        src = int(starts[c])
        dst = slot * cap
        shard_vecs[s, dst : dst + cnt] = vecs[src : src + cnt]
        if scales is not None:
            shard_scales[s, dst : dst + cnt] = scales[src : src + cnt]
        shard_ids[s, dst : dst + cnt] = ids[src : src + cnt]
        shard_cents[s, slot] = np.asarray(base.centroids)[c]
        shard_starts[s, slot] = dst
        shard_counts[s, slot] = cnt
    return (shard_vecs, shard_scales, shard_ids, shard_cents,
            shard_starts, shard_counts)


class ShardedIVFIndex:
    """Multi-chip IVF: subcells round-robin over the mesh's data axis, one
    compiled program runs the local union-scan on every chip in parallel and
    merges with a single all_gather over ICI (the <10 ms / 100M-vector
    north-star layout: 12.5M int8 rows per v5e chip x 8).

    Built FROM a single-index build so centroids/assignments are identical;
    per-shard corpora are re-packed cell-contiguously.
    """

    def __init__(self, base: ItemIndex, mesh, axis: str = "data"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if not base.is_ivf:
            raise ValueError("ShardedIVFIndex requires an IVF-built base index")
        self.mesh = mesh
        self.axis = axis
        self.metric = base.metric
        self.nprobe = base.nprobe
        self.cell_cap = int(base.cell_cap)
        n_shards = mesh.shape[axis]
        (shard_vecs, shard_scales, shard_ids, shard_cents,
         shard_starts, shard_counts) = _partition_ivf_subcells(base, n_shards)
        scales = None if base.row_scales is None else shard_scales

        sh = NamedSharding(mesh, P(axis))
        self.vectors = jax.device_put(jnp.asarray(shard_vecs), sh)
        self.row_scales = (
            jax.device_put(jnp.asarray(shard_scales), sh) if scales is not None else None
        )
        self.centroids = jax.device_put(jnp.asarray(shard_cents), sh)
        self.cluster_items = jax.device_put(jnp.asarray(shard_starts), sh)
        self.cluster_counts = jax.device_put(jnp.asarray(shard_counts), sh)
        self.shard_item_ids = jax.device_put(jnp.asarray(shard_ids, jnp.int32), sh)
        self._compiled = {}

    def search(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], GLOBAL item ids [B, k]) — one SPMD program."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        q = jnp.asarray(queries, jnp.float32)
        if self.metric == "cosine":
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        s_cells = int(self.centroids.shape[1])
        nprobe = min(self.nprobe, s_cells)
        max_union = min(q.shape[0] * nprobe, s_cells)
        quant = self.row_scales is not None
        key = (k, nprobe, max_union, q.shape[0], quant)
        if key not in self._compiled:
            axis = self.axis

            def local(qr, vec, scl, cen, st, cn, ids):
                # leading shard axis arrives size-1 inside shard_map
                vals, rows = _ivf_search_impl(
                    qr, vec[0], scl[0], cen[0], st[0], cn[0],
                    k=k, nprobe=nprobe, max_union=max_union, cap=self.cell_cap,
                    quantized=quant,
                )
                gids = ids[0][rows]
                all_vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
                all_ids = jax.lax.all_gather(gids, axis, axis=-1, tiled=True)
                top_vals, pos = jax.lax.top_k(all_vals, k)
                return top_vals, jnp.take_along_axis(all_ids, pos, axis=-1)

            sharded = P(self.axis)
            self._compiled[key] = jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(P(), sharded, sharded, sharded, sharded, sharded, sharded),
                out_specs=(P(), P()),
                check_vma=False,  # scan carries are shard-varying by design
            ))
        scales = self.row_scales if quant else jnp.ones((self.mesh.shape[self.axis], 1), jnp.float32)
        vals, ids = self._compiled[key](
            q, self.vectors, scales, self.centroids,
            self.cluster_items, self.cluster_counts, self.shard_item_ids,
        )
        return np.asarray(vals), np.asarray(ids)


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

def _quantize_rows_int8(vectors: jnp.ndarray):
    """Per-row symmetric int8 quantization: row = int8 * scale."""
    v = jnp.asarray(vectors, jnp.float32)
    scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(v / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _ivf_search_impl(q, vectors, row_scales, centroids, starts, counts, *, k: int,
                     nprobe: int, max_union: int, cap: int, quantized: bool = False,
                     impl: str = "exact"):
    """Union-scan IVF: dedupe the batch's probed subcells, then scan the
    union — each step reads ONE subcell as a contiguous [cap, D] dynamic
    slice (full HBM bandwidth; random row gathers measured ~6x slower) and
    scores it against ALL queries (extra cells only improve a query's
    recall). Running top-k merge across steps. With ``quantized`` the corpus
    is int8 with per-row scales applied AFTER the matmul."""
    qf = q.astype(jnp.float32)
    cscores = qf @ centroids.T.astype(jnp.float32)  # [B, S]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [B, P]
    b, d = q.shape
    n = vectors.shape[0]

    # process SLOTS_PER_STEP subcells per scan step: fewer, fatter steps
    # (256 tiny slice+matmul steps are per-step-latency bound)
    spc = 8
    n_steps = -(-max_union // spc)
    # per-step candidate cap: a step scores spc*cap rows, so that is the most
    # it can contribute; the RUNNING merge still carries the full k columns
    # (k > cap must not silently truncate the result width — callers index
    # [:, :k]). Slots past the true candidate count surface as -inf scores.
    k_step = min(k, spc * cap)

    # dedupe probe ids into at most max_union slots (sentinel -1 elsewhere)
    flat = jnp.sort(probe.reshape(-1))
    is_new = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    slot = jnp.where(is_new, jnp.cumsum(is_new) - 1, max_union)  # OOB writes drop
    union = jnp.full((max_union,), -1, jnp.int32).at[slot].set(flat, mode="drop")

    def step(carry, si):
        vals, idx = carry
        blocks, scale_blocks, metas = [], [], []
        for j in range(spc):
            u = si * spc + j
            cell = jnp.where(u < max_union, union[jnp.minimum(u, max_union - 1)], -1)
            valid_cell = cell >= 0
            cell_safe = jnp.maximum(cell, 0)
            start = jnp.where(valid_cell, starts[cell_safe], 0)
            # slice start clamps so [cap] rows fit; the cell's rows then
            # begin at `shift` within the slice
            slice_start = jnp.minimum(start, n - cap)
            shift = start - slice_start
            blocks.append(jax.lax.dynamic_slice_in_dim(vectors, slice_start, cap))
            if quantized:
                scale_blocks.append(jax.lax.dynamic_slice_in_dim(row_scales, slice_start, cap))
            metas.append((slice_start, shift, counts[cell_safe], valid_cell))
        block = jnp.concatenate(blocks, axis=0)  # [spc*cap, D] contiguous reads
        if quantized:
            # int8 -> bf16 dequant stays in registers; per-row scale applies
            # to the f32 score (one broadcast multiply)
            qb = qf.astype(jnp.bfloat16)
            scores = jnp.dot(qb, block.astype(jnp.bfloat16).T,
                             preferred_element_type=jnp.float32)
            scores = scores * jnp.concatenate(scale_blocks)[None, :]
        else:
            scores = qf @ block.T.astype(jnp.float32)  # [B, spc*cap]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, spc * cap), 1) % cap
        seg = jax.lax.broadcasted_iota(jnp.int32, (1, spc * cap), 1) // cap
        shift_v = jnp.stack([m[1] for m in metas])  # [spc]
        count_v = jnp.stack([m[2] for m in metas])
        valid_v = jnp.stack([m[3] for m in metas])
        base_v = jnp.stack([m[0] for m in metas])
        row_valid = (pos >= shift_v[seg]) & (pos < shift_v[seg] + count_v[seg]) & valid_v[seg]
        scores = jnp.where(row_valid, scores, -jnp.inf)
        if impl == "approx":
            top_s, top_pos = jax.lax.approx_max_k(scores, k_step, recall_target=0.95)
        else:
            top_s, top_pos = jax.lax.top_k(scores, k_step)
        top_rows = base_v[top_pos // cap] + top_pos % cap
        all_s = jnp.concatenate([vals, top_s], axis=-1)
        all_i = jnp.concatenate([idx, top_rows], axis=-1)
        best_s, best_pos = jax.lax.top_k(all_s, k)
        return (best_s, jnp.take_along_axis(all_i, best_pos, axis=-1)), None

    init = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.zeros((b, k), jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(step, init, jnp.arange(n_steps))
    return vals, rows


class HostTieredIVFIndex:
    """IVF search for corpora BEYOND one chip's HBM: int8 cells stay
    resident in HOST RAM; only the batch's probed subcells stream to the
    chip, double-buffered against device scoring (the encode_stream overlap
    pattern), and a running top-k merge lives on device.

    This is the missing tier between the single-chip 12.58M-row ceiling and
    the 100M north star (BASELINE.md): what Faiss gets from CPU RAM for free
    (the reference's eval utils fall back to CPU/numpy search,
    Nexus/evaluation/text_retrieval/utils.py:148-229), done TPU-side — the
    chip still does all scoring on the MXU, the host is a passive cell
    store. Budget per batch = max(host gather + H2D transfer, device
    scoring); on a PCIe host the transfer of P probed cells (P*cap*D int8
    bytes) rides ~16 GB/s, on this relay VM it is capped at ~24 MB/s
    (BENCH_NOTES text-stream section) — bench_search_tiered.py measures the
    split explicitly.

    Centroids (small) live on device; the coarse probe is one compiled
    program, the per-chunk scorer another (carry donated, so the running
    top-k never round-trips).
    """

    def __init__(self, base: ItemIndex, chunk_cells: int = 8, prefetch: int = 2):
        if not base.is_ivf:
            raise ValueError("HostTieredIVFIndex requires an IVF-built base index")
        self.metric = base.metric
        self.nprobe = int(base.nprobe)
        self.cell_cap = int(base.cell_cap)
        self.chunk_cells = int(chunk_cells)
        self.prefetch = int(prefetch)
        self.topk_impl = base.topk_impl
        # host tier: the corpus (int8 or dense) + per-row scales + ids
        self.h_vectors = np.asarray(base.vectors)
        self.h_scales = (None if base.row_scales is None
                         else np.asarray(base.row_scales, np.float32))
        self.item_ids = np.asarray(base.item_ids)
        self.h_starts = np.asarray(base.cluster_items, np.int64)
        self.h_counts = np.asarray(base.cluster_counts, np.int64)
        # device tier: centroids only
        self.centroids = jnp.asarray(base.centroids)
        self._compiled = {}

    @classmethod
    def from_arrays(cls, vectors: np.ndarray, centroids: np.ndarray,
                    starts: np.ndarray, counts: np.ndarray, cell_cap: int,
                    row_scales: Optional[np.ndarray] = None,
                    item_ids: Optional[np.ndarray] = None, metric: str = "ip",
                    nprobe: int = 10, chunk_cells: int = 8,
                    prefetch: int = 2) -> "HostTieredIVFIndex":
        """Host-resident construction: `vectors` NEVER touches the device
        (an ItemIndex-mediated build would device_put the whole corpus —
        the exact thing this tier exists to avoid). `vectors` must already
        be in the cell-contiguous layout described by starts/counts."""
        self = cls.__new__(cls)
        self.metric = metric
        self.nprobe = int(nprobe)
        self.cell_cap = int(cell_cap)
        self.chunk_cells = int(chunk_cells)
        self.prefetch = int(prefetch)
        self.topk_impl = "exact"
        self.h_vectors = np.asarray(vectors)
        self.h_scales = (None if row_scales is None
                         else np.asarray(row_scales, np.float32))
        self.item_ids = (np.arange(vectors.shape[0])
                         if item_ids is None else np.asarray(item_ids))
        self.h_starts = np.asarray(starts, np.int64)
        self.h_counts = np.asarray(counts, np.int64)
        self.centroids = jnp.asarray(centroids)
        self._compiled = {}
        return self

    # -- device programs ---------------------------------------------------

    def _probe_fn(self, b: int, nprobe: int):
        key = ("probe", b, nprobe)
        if key not in self._compiled:
            def probe(q, centroids):
                cs = q @ centroids.T.astype(jnp.float32)
                _, cells = jax.lax.top_k(cs, nprobe)
                return cells
            self._compiled[key] = jax.jit(probe)
        return self._compiled[key]

    def _score_fn(self, b: int, k: int):
        """One chunk: score [C*cap, D] host-gathered rows against all
        queries, merge into the running (vals, rows) carry (donated)."""
        key = ("score", b, k, self.chunk_cells, self.h_scales is not None)
        if key not in self._compiled:
            cap = self.cell_cap
            spc = self.chunk_cells
            quantized = self.h_scales is not None
            k_step = min(k, spc * cap)

            @partial(jax.jit, donate_argnums=(0, 1))
            def score(vals, rows, q, block, scales, bases, counts):
                if quantized:
                    s = jnp.dot(q.astype(jnp.bfloat16),
                                block.astype(jnp.bfloat16).T,
                                preferred_element_type=jnp.float32)
                    s = s * scales[None, :]
                else:
                    s = q @ block.T.astype(jnp.float32)
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, spc * cap), 1) % cap
                seg = jax.lax.broadcasted_iota(jnp.int32, (1, spc * cap), 1) // cap
                valid = pos < counts[seg]
                s = jnp.where(valid, s, -jnp.inf)
                if self.topk_impl == "approx":
                    top_s, top_pos = jax.lax.approx_max_k(s, k_step, recall_target=0.95)
                else:
                    top_s, top_pos = jax.lax.top_k(s, k_step)
                top_rows = (bases[top_pos // cap] + (top_pos % cap)).astype(jnp.int32)
                all_s = jnp.concatenate([vals, top_s], axis=-1)
                all_r = jnp.concatenate([rows, top_rows], axis=-1)
                best_s, best_pos = jax.lax.top_k(all_s, k)
                return best_s, jnp.take_along_axis(all_r, best_pos, axis=-1)

            self._compiled[key] = score
        return self._compiled[key]

    # -- host gather -------------------------------------------------------

    def _gather_chunk(self, cells) -> tuple:
        """Host-side: copy `cells` (<= chunk_cells ids, padded with -1) into
        one contiguous [C*cap, D] block + scales/bases/counts side arrays."""
        cap, spc, d = self.cell_cap, self.chunk_cells, self.h_vectors.shape[1]
        block = np.zeros((spc * cap, d), self.h_vectors.dtype)
        scales = np.zeros((spc * cap,), np.float32)
        bases = np.zeros((spc,), np.int32)
        counts = np.zeros((spc,), np.int32)
        for j, c in enumerate(cells):
            if c < 0:
                continue
            lo = self.h_starts[c]
            cnt = int(self.h_counts[c])
            block[j * cap : j * cap + cnt] = self.h_vectors[lo : lo + cnt]
            if self.h_scales is not None:
                scales[j * cap : j * cap + cnt] = self.h_scales[lo : lo + cnt]
            bases[j] = lo
            counts[j] = cnt
        return block, scales, bases, counts

    # -- search ------------------------------------------------------------

    def search(self, queries, k: int, timers: Optional[dict] = None):
        """(scores [B, k], item_ids [B, k]). ``timers`` (optional dict)
        accumulates 'probe', 'gather', 'transfer', 'score' seconds."""
        import queue as _queue
        import threading
        import time as _time

        q = jnp.asarray(queries, jnp.float32)
        if self.metric == "cosine":
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
        n_true = q.shape[0]
        # pow-2 query-count bucket (see ItemIndex.search)
        from nexus_tpu.utils.buckets import batch_bucket

        target = batch_bucket(n_true, cap=1024)
        if target != n_true:
            q = jnp.pad(q, ((0, target - n_true), (0, 0)))
        b = q.shape[0]
        nprobe = min(self.nprobe, self.centroids.shape[0])

        t0 = _time.perf_counter()
        # pad queries join the probe program but NOT the union (their
        # cells would cost real host-gather + transfer bytes)
        cells = np.unique(
            np.asarray(self._probe_fn(b, nprobe)(q, self.centroids))[:n_true])
        if timers is not None:
            timers["probe"] = timers.get("probe", 0.0) + _time.perf_counter() - t0

        spc = self.chunk_cells
        n_chunks = max(-(-len(cells) // spc), 1)
        padded = np.full((n_chunks * spc,), -1, np.int64)
        padded[: len(cells)] = cells

        # producer thread: host gather + device_put of chunk i+1 overlaps
        # the device scoring of chunk i (GIL released during both the numpy
        # copies and the transfer)
        chunks: _queue.Queue = _queue.Queue(maxsize=max(self.prefetch, 1))
        stats = {"gather": 0.0, "transfer": 0.0}
        err: list = []
        cancel = threading.Event()  # consumer failure must unblock the
        # producer's bounded put() or the thread (plus its pinned host
        # blocks and device buffers) leaks per failed search

        def _put(obj) -> None:
            while not cancel.is_set():
                try:
                    chunks.put(obj, timeout=0.1)
                    return
                except _queue.Full:
                    continue

        def producer():
            try:
                for ci in range(n_chunks):
                    if cancel.is_set():
                        return
                    t1 = _time.perf_counter()
                    block, scales, bases, counts = self._gather_chunk(
                        padded[ci * spc : (ci + 1) * spc])
                    t2 = _time.perf_counter()
                    dev = (jax.device_put(block), jax.device_put(scales),
                           jax.device_put(bases), jax.device_put(counts))
                    jax.block_until_ready(dev)
                    t3 = _time.perf_counter()
                    stats["gather"] += t2 - t1
                    stats["transfer"] += t3 - t2
                    _put(dev)
            except Exception as e:  # pragma: no cover
                err.append(e)
                _put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()

        score = self._score_fn(b, k)
        vals = jnp.full((b, k), -jnp.inf, jnp.float32)
        rows = jnp.zeros((b, k), jnp.int32)
        t_score = 0.0
        try:
            for _ in range(n_chunks):
                item = chunks.get()
                if item is None:
                    raise err[0]
                t4 = _time.perf_counter()
                vals, rows = score(vals, rows, q, *item)
                t_score += _time.perf_counter() - t4
        finally:
            cancel.set()
            while True:  # drain so a blocked put exits immediately
                try:
                    chunks.get_nowait()
                except _queue.Empty:
                    break
            th.join(timeout=30.0)
        vals_np = np.asarray(vals)[:n_true]
        rows_np = np.asarray(rows)[:n_true]
        if timers is not None:
            timers["gather"] = timers.get("gather", 0.0) + stats["gather"]
            timers["transfer"] = timers.get("transfer", 0.0) + stats["transfer"]
            timers["score"] = timers.get("score", 0.0) + t_score
            timers["cells"] = timers.get("cells", 0) + int(len(cells))
        return vals_np, self.item_ids[rows_np]


class TieredShardedIVFIndex:
    """The 100M-vector north-star composition (BASELINE.md: <10 ms p50
    top-100 over 100M rows on v5e-8): subcells round-robin over N shards —
    the ShardedIVFIndex layout — with EACH shard served by a
    HostTieredIVFIndex, so every chip scores its probed cells on the MXU
    while its corpus slice lives in host RAM (8 x 16 GB HBM holds ~100M
    int8x768 rows directly; the host tier removes even that ceiling).

    On real v5e-8 hardware every shard is an independent host->chip stream
    and all N run CONCURRENTLY (one process per host slice; the final merge
    is one k-wide all_gather over ICI). This class is the single-process
    composition used by the CPU-mesh dryrun (phase 10) and the budget bench
    (bench_search_tiered.py): shards execute in sequence, so its wall time
    is N x the per-shard leg — the per-shard latency plus the merge is the
    number the north-star budget composes (BENCH_NOTES round-5 table).

    Replaces: Faiss sharded/IVF serving at scales past one accelerator
    (ref Nexus/evaluation/text_retrieval/utils.py:148-229 falls back to CPU
    numpy; ref inference/utils.py:8-27 is single-GPU IVFFlat)."""

    def __init__(self, base: ItemIndex, n_shards: int, chunk_cells: int = 8,
                 prefetch: int = 2):
        if not base.is_ivf:
            raise ValueError("TieredShardedIVFIndex requires an IVF base index")
        self.metric = base.metric
        self.nprobe = int(base.nprobe)
        self.n_shards = int(n_shards)
        (shard_vecs, shard_scales, shard_ids, shard_cents,
         shard_starts, shard_counts) = _partition_ivf_subcells(base, n_shards)
        quant = base.row_scales is not None
        self.shards = [
            HostTieredIVFIndex.from_arrays(
                shard_vecs[s], shard_cents[s], shard_starts[s],
                shard_counts[s], cell_cap=int(base.cell_cap),
                row_scales=shard_scales[s] if quant else None,
                item_ids=shard_ids[s], metric=base.metric,
                nprobe=self.nprobe, chunk_cells=chunk_cells,
                prefetch=prefetch,
            )
            for s in range(n_shards)
        ]

    def search(self, queries, k: int, timers: Optional[dict] = None,
               per_shard_times: Optional[list] = None):
        """(scores [B, k], GLOBAL item ids [B, k]). ``per_shard_times``
        (optional list) collects each shard's wall seconds — on real
        hardware the shards run concurrently, so max(per_shard_times) + the
        merge is the composed latency estimate."""
        import time as _time

        all_scores, all_ids = [], []
        for shard in self.shards:
            t0 = _time.perf_counter()
            s, i = shard.search(queries, k, timers=timers)
            if per_shard_times is not None:
                per_shard_times.append(_time.perf_counter() - t0)
            all_scores.append(s)
            all_ids.append(i)
        # k-wide merge (on hardware: one all_gather over ICI + top_k)
        cat_s = np.concatenate(all_scores, axis=1)  # [B, N*k]
        cat_i = np.concatenate(all_ids, axis=1)
        order = np.argsort(-cat_s, axis=1)[:, :k]
        return (np.take_along_axis(cat_s, order, axis=1),
                np.take_along_axis(cat_i, order, axis=1))
