"""Negative samplers (parity: Nexus/modules/sampler.py:125-780).

Functional JAX redesign:
- every sampler is an immutable dataclass; ``update(key, item_embs)`` returns
  a NEW sampler carrying the rebuilt index (kmeans codebooks, inverted
  indexes) instead of mutating buffers;
- every ``__call__`` takes an explicit PRNG key and is jit-safe (static
  shapes, no host sync);
- ragged CSR inverted indexes become DENSE PADDED per-cluster tables
  ([n_clusters, max_cluster_size]) — vectorized gathers instead of per-bucket
  Python loops, the natural TPU layout;
- categorical draws use Gumbel/`jax.random.categorical` over log-weights
  (the XLA equivalent of torch.multinomial(replacement=True)).

Item-id convention matches the reference: ids are 0-based rows of the item
embedding matrix; probability lookups use a padding slot at index 0
internally (id+1 indexing).

Call contract (parity):
    sampler(key, query, num_neg)              -> (neg_ids, log_neg_prob)
    sampler(key, query, num_neg, pos_items)   -> (log_pos_prob, neg_ids, log_neg_prob)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from nexus_tpu.modules.score import CosineScorer, EuclideanScorer
from nexus_tpu.ops.kmeans import kmeans

Array = jnp.ndarray


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _pop_weights(pop_count: Array, mode: int) -> Array:
    """Popularity transform with a prepended padding slot (value 1.0)."""
    pop = jnp.concatenate([jnp.ones((1,), jnp.float32), jnp.asarray(pop_count, jnp.float32)])
    if mode == 0:
        return jnp.log(pop + 1.0)
    if mode == 1:
        return jnp.log(pop + 1.0) + 1e-6
    if mode == 2:
        return pop**0.75
    raise ValueError("pop mode must be 0, 1 or 2")


def _query_lead_shape(query, num_neg):
    if isinstance(query, int):
        return (query,), query
    lead = query.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    return lead, n


def _categorical(key: jax.Array, log_weights: Array, shape) -> Array:
    """Draw with replacement from unnormalized log-weights along the last axis."""
    return jax.random.categorical(key, log_weights, axis=-1, shape=shape)


def build_padded_cluster_index(assign: Array, n_clusters: int, weights: Optional[Array] = None):
    """Dense padded inverted index from a cluster assignment.

    Returns (items [K, maxlen] int32, counts [K] int32, cp [K, maxlen] or None)
    where cp is the within-cluster normalized cumulative weight table used for
    popularity-weighted within-cluster draws. Runs eagerly (update path), so
    maxlen may be data-dependent.
    """
    assign = jnp.asarray(assign)
    n = assign.shape[0]
    counts = jnp.bincount(assign, length=n_clusters)
    maxlen = max(int(jnp.max(counts)), 1)
    order = jnp.argsort(assign, stable=True)  # item rows grouped by cluster
    # position of each sorted element within its cluster
    starts = jnp.cumsum(counts) - counts
    pos_in_cluster = jnp.arange(n) - starts[assign[order]]
    items = jnp.zeros((n_clusters, maxlen), jnp.int32).at[assign[order], pos_in_cluster].set(
        order.astype(jnp.int32)
    )
    cp = None
    if weights is not None:
        w = jnp.zeros((n_clusters, maxlen), jnp.float32).at[assign[order], pos_in_cluster].set(
            jnp.asarray(weights, jnp.float32)[order]
        )
        csum = jnp.cumsum(w, axis=-1)
        total = jnp.maximum(csum[:, -1:], 1e-12)
        cp = csum / total
    return items, counts.astype(jnp.int32), cp


def _draw_from_padded(key, items, counts, cp, cluster_ids):
    """Sample one item per entry of ``cluster_ids`` from a padded cluster index.

    Uniform within cluster when cp is None, else cp-weighted. Returns
    (item_ids, within_idx)."""
    u = jax.random.uniform(key, cluster_ids.shape)
    cnt = counts[cluster_ids]
    if cp is None:
        idx = jnp.minimum(jnp.floor(u * cnt).astype(jnp.int32), jnp.maximum(cnt - 1, 0))
    else:
        rows = cp[cluster_ids]  # [..., maxlen]
        idx = jnp.sum((rows < u[..., None]).astype(jnp.int32), axis=-1)
        idx = jnp.minimum(idx, jnp.maximum(cnt - 1, 0))
    return items[cluster_ids, idx], idx


# --------------------------------------------------------------------------
# basic samplers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class UniformSampler:
    """Uniform negatives over [0, num_items) (parity: sampler.py:141-176)."""

    num_items: int
    scorer: Optional[object] = None

    @property
    def needs_update(self) -> bool:
        return False

    def update(self, key, item_embs, **kw):
        return self

    def compute_item_p(self, query, items) -> Array:
        return jnp.zeros_like(items, dtype=jnp.float32)

    def __call__(self, key: jax.Array, query, num_neg: int, pos_items: Optional[Array] = None):
        lead, _ = _query_lead_shape(query, num_neg)
        neg = jax.random.randint(key, (*lead, num_neg), 0, self.num_items)
        neg_prob = self.compute_item_p(query, neg)
        if pos_items is not None:
            return self.compute_item_p(query, pos_items), neg, neg_prob
        return neg, neg_prob


def uniform_sample_masked_hist(
    key: jax.Array, num_items: int, num_neg: int, user_hist: Array,
    num_query_per_user: Optional[int] = None,
) -> Array:
    """Uniform sampling over items NOT in the user's history
    (parity: sampler.py:52-83). ``user_hist`` is [B, L], 0-padded, ids 1-based.
    ``num_items`` is the count of REAL items: the output universe is
    [1, num_items] minus the history.

    Trick: draw from the (num_items - |hist|) "gap" positions, then shift each
    draw up past the sorted history entries with a searchsorted rank.
    """
    n_q = 1 if num_query_per_user is None else num_query_per_user
    num_user, hist_len = user_hist.shape
    u = jax.random.uniform(key, (num_user, n_q * num_neg))
    non_zero = jnp.sum(user_hist != 0, axis=-1)  # [B]
    draws = jnp.floor(u * (num_items - non_zero)[:, None]).astype(jnp.int32) + 1
    sorted_hist = jnp.sort(user_hist, axis=-1)
    offset = jnp.arange(hist_len)[None, :] - (hist_len - non_zero)[:, None]
    offset = jnp.maximum(offset, 0)
    packed_hist = sorted_hist - offset  # history remapped into gap-space
    rank = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(packed_hist, draws)
    neg = draws + (rank - (hist_len - non_zero)[:, None])
    if num_query_per_user is not None:
        neg = neg.reshape(num_user, num_query_per_user, num_neg)
    return neg


@dataclass(frozen=True)
class MaskedUniformSampler(UniformSampler):
    """Uniform negatives excluding the user's interaction history
    (parity: sampler.py:215-245).

    Id convention: item ids are RAW ids that double as feature-table rows;
    id 0 is the padding item, real items live in [1, num_items-1]. The gap
    sampler therefore draws over ``num_items - 1`` real items so emitted ids
    never exceed the table (an id == num_items would be silently clamped by
    the XLA gather in train_forward, attributing wrong features)."""

    def __call__(self, key, query, num_neg, pos_items=None, user_hist: Array = None):
        if user_hist is None:
            raise ValueError("MaskedUniformSampler requires user_hist")
        n_real = self.num_items - 1  # ids 1..num_items-1; row 0 = padding
        if query.ndim == 2:
            neg = uniform_sample_masked_hist(key, n_real, num_neg, user_hist)
        elif query.ndim == 3:
            neg = uniform_sample_masked_hist(
                key, n_real, num_neg, user_hist, num_query_per_user=query.shape[1]
            )
        else:
            raise ValueError("query must be 2- or 3-dimensional")
        neg_prob = self.compute_item_p(query, neg)
        if pos_items is not None:
            return self.compute_item_p(query, pos_items), neg, neg_prob
        return neg, neg_prob


@dataclass(frozen=True)
class PopularSampler:
    """Popularity-proportional negatives via inverse-CDF on the cumulative
    popularity table (parity: sampler.py:246-286)."""

    pop_prob: Array  # [num_items + 1] incl. padding slot 0
    table: Array  # cumulative
    num_items: int

    @classmethod
    def build(cls, pop_count, mode: int = 0) -> "PopularSampler":
        w = _pop_weights(pop_count, mode)
        prob = w / jnp.sum(w)
        return cls(pop_prob=prob, table=jnp.cumsum(prob), num_items=int(len(w) - 1))

    @property
    def needs_update(self) -> bool:
        return False

    def update(self, key, item_embs, **kw):
        return self

    def compute_item_p(self, query, items) -> Array:
        idx = jnp.where(items >= self.num_items, -1, items) + 1
        # epsilon floor: zero-popularity items can be hit at searchsorted
        # boundaries; a floored log keeps sampled-softmax corrections finite
        return jnp.log(self.pop_prob[idx] + 1e-12)

    def __call__(self, key, query, num_neg, pos_items=None):
        lead, _ = _query_lead_shape(query, num_neg)
        seeds = jax.random.uniform(key, (*lead, num_neg))
        flat = jnp.searchsorted(self.table, seeds.reshape(-1))
        neg = flat.reshape(*lead, num_neg).astype(jnp.int32) - 1
        neg = jnp.clip(neg, 0, self.num_items - 1)
        neg_prob = self.compute_item_p(query, neg)
        if pos_items is not None:
            return self.compute_item_p(query, pos_items), neg, neg_prob
        return neg, neg_prob


# --------------------------------------------------------------------------
# MIDX: two-level softmax-tree sampling over kmeans codebooks
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class MIDXUniformSampler:
    """MIDX sampler with uniform within-cluster draws
    (parity: sampler.py:287-434; 'FastVAE' quantized proposal).

    Index state (built by `update`):
      c0/c1: kmeans codebooks over the two halves of the item embedding,
      cd0/cd1: per-item (+padding) cluster codes,
      wkk: cluster co-occurrence weights K0 x K1,
      padded inverted index over the K² combined clusters.
    """

    num_items: int
    num_clusters: int
    scorer: Optional[object] = None
    pop_count: Optional[Array] = None  # set in MIDXPopSampler
    pop_mode: int = 1
    # index state
    c0: Optional[Array] = None
    c1: Optional[Array] = None
    cd0: Optional[Array] = None  # [num_items+1]
    cd1: Optional[Array] = None
    wkk: Optional[Array] = None  # [K, K]
    items: Optional[Array] = None  # [K^2, maxlen]
    counts: Optional[Array] = None  # [K^2]
    cp: Optional[Array] = None  # [K^2, maxlen] popularity cumsum or None
    p: Optional[Array] = None  # [num_items+1] within-cluster weight (log correction)

    @property
    def _use_pop(self) -> bool:
        return self.pop_count is not None

    @property
    def needs_update(self) -> bool:
        return self.c0 is None

    def update(self, key, item_embs: Array, max_iter: int = 30) -> "MIDXUniformSampler":
        if isinstance(self.scorer, CosineScorer):
            item_embs = item_embs / jnp.maximum(
                jnp.linalg.norm(item_embs, axis=-1, keepdims=True), 1e-12
            )
        k = self.num_clusters
        half = item_embs.shape[-1] // 2
        e0, e1 = item_embs[:, :half], item_embs[:, half:]
        k0key, k1key = jax.random.split(key)
        c0, a0 = kmeans(k0key, e0, k, max_iter)
        c1, a1 = kmeans(k1key, e1, k, max_iter)
        cd0 = jnp.concatenate([jnp.full((1,), -1, jnp.int32), a0]) + 1
        cd1 = jnp.concatenate([jnp.full((1,), -1, jnp.int32), a1]) + 1
        combined = a0 * k + a1

        # within-cluster weight w_i (uniform: 1; pop: pop weight; euclidean: e^{-||v||²/2})
        if self._use_pop:
            w = _pop_weights(self.pop_count, self.pop_mode)[1:]
        elif isinstance(self.scorer, EuclideanScorer):
            w = jnp.exp(-0.5 * jnp.sum(item_embs**2, axis=-1))
        else:
            w = None

        if w is None:
            onehot_w = jnp.ones((item_embs.shape[0],), jnp.float32)
        else:
            onehot_w = w
        # wkk[k0, k1] = sum of weights of items with codes (k0, k1)
        wkk = jax.ops.segment_sum(onehot_w, combined, num_segments=k * k).reshape(k, k)

        items, counts, cp = build_padded_cluster_index(combined, k * k, weights=w)
        p = None if w is None else jnp.concatenate([jnp.ones((1,), jnp.float32), w])
        return dataclasses.replace(
            self, c0=c0, c1=c1, cd0=cd0, cd1=cd1, wkk=wkk, items=items, counts=counts, cp=cp, p=p
        )

    def __call__(self, key, query: Array, num_neg: int, pos_items: Optional[Array] = None):
        if self.c0 is None:
            raise RuntimeError("MIDX sampler not updated; call .update(key, item_embs) first")
        if isinstance(self.scorer, CosineScorer):
            query = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
        lead = query.shape[:-1]
        qf = query.reshape(-1, query.shape[-1])
        half = qf.shape[-1] // 2
        q0, q1 = qf[:, :half], qf[:, half:]
        k = self.num_clusters
        r0 = q0 @ self.c0.T  # [Q, K]
        r1 = q1 @ self.c1.T
        r0s = jax.nn.softmax(r0, axis=-1)
        r1s = jax.nn.softmax(r1, axis=-1)
        s0 = (r1s @ self.wkk.T) * r0s  # [Q, K]
        key0, key1, key2 = jax.random.split(key, 3)
        nq = qf.shape[0]
        k0 = _categorical(key0, jnp.log(s0 + 1e-12)[:, None, :], (nq, num_neg))
        p0 = jnp.take_along_axis(r0, k0, axis=-1)
        subwkk = self.wkk[k0]  # [Q, neg, K]
        s1 = subwkk * r1s[:, None, :]
        k1 = _categorical(key1, jnp.log(s1 + 1e-12), (nq, num_neg))
        p1 = jnp.take_along_axis(r1, k1, axis=-1)
        k01 = k0 * k + k1
        p01 = p0 + p1
        neg_items, within_idx = _draw_from_padded(key2, self.items, self.counts, self.cp, k01)
        if self.p is not None:
            neg_prob = p01 + jnp.log(self.p[neg_items + 1])
        else:
            neg_prob = p01
        neg_items = neg_items.reshape(*lead, num_neg)
        neg_prob = neg_prob.reshape(*lead, num_neg)
        if pos_items is not None:
            return self.compute_item_p(query, pos_items), neg_items, neg_prob
        return neg_items, neg_prob

    def compute_item_p(self, query: Array, pos_items: Array) -> Array:
        idx = jnp.where(pos_items >= self.num_items, -1, pos_items) + 1
        squeeze = False
        if idx.ndim == 1:
            idx = idx[:, None]
            squeeze = True
        k0 = self.cd0[idx]  # [B, L1]
        k1 = self.cd1[idx]
        c0_ = jnp.concatenate([jnp.zeros((1, self.c0.shape[1])), self.c0], axis=0)
        c1_ = jnp.concatenate([jnp.zeros((1, self.c1.shape[1])), self.c1], axis=0)
        c0 = c0_[k0]  # [B, L1, D/2]
        c1 = c1_[k1]
        half = query.shape[-1] // 2
        q0, q1 = query[..., :half], query[..., half:]
        if query.ndim == idx.ndim:  # [B, D] vs [B, L1]
            r = jnp.einsum("bld,bd->bl", c0, q0) + jnp.einsum("bld,bd->bl", c1, q1)
        else:  # [B, L, D] vs [B, L(=L1)]
            r = jnp.einsum("bld,bld->bl", c0, q0) + jnp.einsum("bld,bld->bl", c1, q1)
        if self.p is not None:
            r = r + jnp.log(self.p[idx])
        if squeeze:
            r = r[:, 0]
        return r.reshape(pos_items.shape)


@dataclass(frozen=True)
class MIDXPopSampler(MIDXUniformSampler):
    """MIDX with popularity-weighted within-cluster draws
    (parity: sampler.py:435-483)."""

    @classmethod
    def build(cls, pop_count, num_clusters, scorer=None, mode: int = 1) -> "MIDXPopSampler":
        pop_count = jnp.asarray(pop_count, jnp.float32)
        return cls(
            num_items=int(pop_count.shape[0]),
            num_clusters=num_clusters,
            scorer=scorer,
            pop_count=pop_count,
            pop_mode=mode,
        )


# --------------------------------------------------------------------------
# Cluster samplers: one-level kmeans tree
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ClusterUniformSampler:
    """Single-level cluster proposal with uniform within-cluster draws
    (parity: sampler.py:484-595)."""

    num_items: int
    num_clusters: int
    scorer: Optional[object] = None
    pop_count: Optional[Array] = None
    pop_mode: int = 1
    c: Optional[Array] = None
    cd: Optional[Array] = None  # [num_items+1]
    items: Optional[Array] = None
    counts: Optional[Array] = None
    cp: Optional[Array] = None
    p: Optional[Array] = None

    @property
    def _use_pop(self) -> bool:
        return self.pop_count is not None

    @property
    def needs_update(self) -> bool:
        return self.c is None

    def update(self, key, item_embs: Array, max_iter: int = 30) -> "ClusterUniformSampler":
        if isinstance(self.scorer, CosineScorer):
            item_embs = item_embs / jnp.maximum(
                jnp.linalg.norm(item_embs, axis=-1, keepdims=True), 1e-12
            )
        c, assign = kmeans(key, item_embs, self.num_clusters, max_iter)
        cd = jnp.concatenate([jnp.full((1,), -1, jnp.int32), assign]) + 1
        if self._use_pop:
            w = _pop_weights(self.pop_count, self.pop_mode)[1:]
        elif isinstance(self.scorer, EuclideanScorer):
            w = jnp.exp(-0.5 * jnp.sum(item_embs**2, axis=-1))
        else:
            w = None
        items, counts, cp = build_padded_cluster_index(assign, self.num_clusters, weights=w)
        p = None if w is None else jnp.concatenate([jnp.ones((1,), jnp.float32), w])
        return dataclasses.replace(self, c=c, cd=cd, items=items, counts=counts, cp=cp, p=p)

    def __call__(self, key, query: Array, num_neg: int, pos_items: Optional[Array] = None):
        if self.c is None:
            raise RuntimeError("Cluster sampler not updated; call .update first")
        if isinstance(self.scorer, CosineScorer):
            query = query / jnp.maximum(jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12)
        lead = query.shape[:-1]
        qf = query.reshape(-1, query.shape[-1])
        r = qf @ self.c.T  # [Q, K]
        key_k, key_i = jax.random.split(key)
        nq = qf.shape[0]
        rs = jax.nn.softmax(r, axis=-1)
        kk = _categorical(key_k, jnp.log(rs + 1e-12)[:, None, :], (nq, num_neg))
        p_k = jnp.take_along_axis(r, kk, axis=-1)
        neg_items, _ = _draw_from_padded(key_i, self.items, self.counts, self.cp, kk)
        neg_prob = p_k if self.p is None else p_k + jnp.log(self.p[neg_items + 1])
        neg_items = neg_items.reshape(*lead, num_neg)
        neg_prob = neg_prob.reshape(*lead, num_neg)
        if pos_items is not None:
            return self.compute_item_p(query, pos_items), neg_items, neg_prob
        return neg_items, neg_prob

    def compute_item_p(self, query: Array, pos_items: Array) -> Array:
        idx = jnp.where(pos_items >= self.num_items, -1, pos_items) + 1
        squeeze = False
        if idx.ndim == 1:
            idx = idx[:, None]
            squeeze = True
        c_ = jnp.concatenate([jnp.zeros((1, self.c.shape[1])), self.c], axis=0)
        cvec = c_[self.cd[idx]]  # [B, L1, D]
        if query.ndim == idx.ndim:
            r = jnp.einsum("bld,bd->bl", cvec, query)
        else:
            r = jnp.einsum("bld,bld->bl", cvec, query)
        if self.p is not None:
            r = r + jnp.log(self.p[idx])
        if squeeze:
            r = r[:, 0]
        return r.reshape(pos_items.shape)


@dataclass(frozen=True)
class ClusterPopSampler(ClusterUniformSampler):
    @classmethod
    def build(cls, pop_count, num_clusters, scorer=None, mode: int = 1) -> "ClusterPopSampler":
        pop_count = jnp.asarray(pop_count, jnp.float32)
        return cls(
            num_items=int(pop_count.shape[0]),
            num_clusters=num_clusters,
            scorer=scorer,
            pop_count=pop_count,
            pop_mode=mode,
        )


# --------------------------------------------------------------------------
# LSH sampler
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class LSHSampler:
    """LSH-based proposal sampler (parity: sampler.py:626-760).

    ``n_table`` hash tables of ``n_bits`` signed random projections; negatives
    are drawn uniformly from the union (with multiplicity) of the query's
    buckets, with the analytic collision probability as the proposal density.
    """

    num_items: int
    n_dims: int
    n_bits: int = 4
    n_table: int = 16
    scorer: Optional[object] = None
    weight_vectors: Optional[Array] = None  # [D, n_bits, n_table]
    table_indices: Optional[Array] = None  # [L, N]
    table_indptr: Optional[Array] = None  # [L, 2^bits + 1]
    item_embs: Optional[Array] = None

    @classmethod
    def build(cls, key, num_items, n_dims, n_bits=4, n_table=16, scorer=None) -> "LSHSampler":
        w = jax.random.uniform(key, (n_dims, n_bits, n_table))
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return cls(
            num_items=num_items, n_dims=n_dims, n_bits=n_bits, n_table=n_table,
            scorer=scorer, weight_vectors=w,
        )

    @property
    def needs_update(self) -> bool:
        return self.table_indices is None

    def _hash(self, x: Array) -> Array:
        """[B, D] -> [L, B] integer bucket codes."""
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
        y = (xn @ self.weight_vectors.reshape(self.n_dims, -1)).reshape(
            x.shape[0], self.n_bits, self.n_table
        )
        bits = (y > 0).astype(jnp.int32)
        base = (1 << jnp.arange(self.n_bits - 1, -1, -1))[None, :, None]
        return jnp.sum(bits * base, axis=1).T  # [L, B]

    def update(self, key, item_embs: Array, **kw) -> "LSHSampler":
        codes = self._hash(item_embs)  # [L, N]
        n = item_embs.shape[0]
        n_buckets = 2**self.n_bits
        indices, indptrs = [], []
        for t in range(self.n_table):
            code_t = codes[t]
            order = jnp.argsort(code_t, stable=True)
            counts = jnp.bincount(code_t, length=n_buckets)
            indptr = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
            indices.append(order.astype(jnp.int32))
            indptrs.append(indptr)
        return dataclasses.replace(
            self,
            table_indices=jnp.stack(indices),
            table_indptr=jnp.stack(indptrs),
            item_embs=item_embs,
        )

    def __call__(self, key, query: Array, num_neg: int, pos_items: Optional[Array] = None):
        if self.table_indices is None:
            raise RuntimeError("LSH sampler not updated; call .update first")
        b = query.shape[0]
        code = self._hash(query).astype(jnp.int32)  # [L, B]
        start = jnp.take_along_axis(self.table_indptr, code, axis=1)  # [L, B]
        end = jnp.take_along_axis(self.table_indptr, code + 1, axis=1)
        num_cand = (end - start).T  # [B, L]
        len_item = jnp.sum(num_cand, axis=-1)  # [B]
        cum_len = jnp.cumsum(num_cand, axis=-1)  # [B, L]

        key_u, key_fb = jax.random.split(key)
        u = jax.random.uniform(key_u, (b, num_neg))
        rand_idx = jnp.minimum(
            jnp.floor(u * jnp.maximum(len_item, 1)[:, None]).astype(jnp.int32),
            jnp.maximum(len_item - 1, 0)[:, None],
        )
        table_id = jax.vmap(lambda c, v: jnp.searchsorted(c, v, side="right"))(cum_len, rand_idx)
        table_id = jnp.minimum(table_id, self.n_table - 1)
        prev_cum = jnp.where(
            table_id > 0,
            jnp.take_along_axis(cum_len, jnp.maximum(table_id - 1, 0), axis=-1),
            0,
        )
        offset = rand_idx - prev_cum
        bucket_start = jnp.take_along_axis(start.T, table_id, axis=-1)  # [B, neg]
        flat_pos = jnp.clip(bucket_start + offset, 0, self.table_indices.shape[1] - 1)
        item_id = self.table_indices[table_id, flat_pos]  # [B, neg]

        # proposal probability: 1/|candidates| * P(item in candidate set)
        emb = self.item_embs[item_id]  # [B, neg, D]
        qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-10)
        en = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-10)
        cos = jnp.clip(jnp.einsum("bd,bnd->bn", qn, en), -1.0, 1.0)
        theta = jnp.arccos(cos)
        collision_p = 1.0 - theta / jnp.pi
        weight = 1.0 - (1.0 - collision_p**self.n_bits) ** self.n_table
        neg_prob = weight / jnp.maximum(len_item, 1)[:, None]
        log_neg_prob = jnp.log(neg_prob + 1e-12)

        # uniform fallback for queries with empty candidate sets. The
        # fallback log-prob must stay in the same convention as the
        # collision-probability rows (true log-probabilities), so it is
        # -log(num_items) for a uniform draw — NOT 0.0, which would bias the
        # sampled-softmax correction for exactly the empty-bucket queries.
        empty = (len_item == 0)[:, None]
        fb_items = jax.random.randint(key_fb, (b, num_neg), 0, self.num_items)
        item_id = jnp.where(empty, fb_items, item_id)
        log_neg_prob = jnp.where(
            empty, -jnp.log(jnp.float32(self.num_items)), log_neg_prob
        )

        if pos_items is not None:
            return jnp.zeros_like(pos_items, dtype=jnp.float32), item_id, log_neg_prob
        return item_id, log_neg_prob


# --------------------------------------------------------------------------
# Retriever (IRGAN-style) sampler — delegates to a trained retriever
# --------------------------------------------------------------------------

class RetrieverSampler:
    """Sample negatives from a trained retriever's distribution
    (parity: sampler.py:179-211). The wrapped retriever must expose
    ``sampling(key, query, num_neg, pos_items, method)``."""

    def __init__(self, num_items, retriever=None, method: str = "brute", t: float = 1.0):
        self.num_items = num_items
        self.retriever = retriever
        self.method = method
        self.t = t

    def update(self, key, item_embs, **kw):
        if hasattr(self.retriever, "update_item_vectors"):
            self.retriever.update_item_vectors(item_embs)
        return self

    def __call__(self, key, query, num_neg, pos_items=None):
        out = self.retriever.sampling(
            key=key, query=query, num_neg=num_neg, pos_items=pos_items, method=self.method
        )
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)


def get_sampler(name: str, **kwargs):
    name = name.lower().replace("sampler", "").strip("_")
    table = {
        "uniform": UniformSampler,
        "masked_uniform": MaskedUniformSampler,
        "maskeduniform": MaskedUniformSampler,
        "popular": PopularSampler.build,
        "midx_uni": MIDXUniformSampler,
        "midxuniform": MIDXUniformSampler,
        "midx_pop": MIDXPopSampler.build,
        "midxpop": MIDXPopSampler.build,
        "cluster_uni": ClusterUniformSampler,
        "clusteruniform": ClusterUniformSampler,
        "cluster_pop": ClusterPopSampler.build,
        "clusterpop": ClusterPopSampler.build,
        "lsh": LSHSampler.build,
        "retriever": RetrieverSampler,
    }
    if name not in table:
        raise ValueError(f"unknown sampler {name!r}; known: {sorted(table)}")
    return table[name](**kwargs)
