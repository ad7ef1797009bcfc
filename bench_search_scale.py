"""At-scale retrieval latency: top-100 over 12.58M x 768 int8 vectors on ONE
chip — the per-chip building block of the <10 ms p50 / 100M-vector north star
(8 x 12.58M = 100.6M on v5e-8; the cross-chip step is one all_gather of
8 x [Q, 100] merged on every chip — microseconds on ICI, validated on the
8-device CPU mesh in tests/test_inference.py::test_sharded_ivf_matches_single_device).

The corpus is synthesized ON DEVICE directly in the cell-contiguous int8
layout (a host->relay transfer of 9.6 GB would dominate; a 12.5M-row f32
intermediate would not fit 16 GB). The build streams CHUNKED jit calls with
a donated output buffer — the same pattern as ItemIndex.build_streamed; a
single whole-corpus program was observed to stall this relay's compiler for
30+ minutes. Cells are well-separated clusters so recall@10 against the
exact int8 flat scan is meaningful.

Prints one JSON line per stage (stage timestamps included so partial runs
still yield data).
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_LIST = 8192
CAP = 1536
N = N_LIST * CAP  # 12,582,912
DIM = 768
K = 100
ITERS = 10


def fetch(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def log(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from nexus_tpu.inference.index import ItemIndex

    t_start = time.perf_counter()
    log(stage="devices", devices=str(jax.devices()))

    key = jax.random.PRNGKey(0)
    centroids = jax.random.normal(key, (N_LIST, DIM)) * 3.0
    fetch(centroids[0, :8])
    log(stage="centroids_ready", t=round(time.perf_counter() - t_start, 1))

    chunk = CAP * 128  # 196,608 rows per build step, 64 steps
    n_chunks = N // chunk

    # streamed build: donated buffer, one small program compiled once
    @partial(jax.jit, donate_argnums=(0,))
    def write_chunk(buf, key, centroids, i):
        cells = (i * chunk + jnp.arange(chunk)) // CAP
        rows = centroids[cells] * 12.0 + 8.0 * jax.random.normal(
            jax.random.fold_in(key, i), (chunk, DIM)
        )
        q = jnp.clip(jnp.round(rows), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice_in_dim(buf, q, i * chunk, axis=0)

    t0 = time.perf_counter()
    buf = jnp.zeros((N, DIM), jnp.int8)
    for i in range(n_chunks):
        buf = write_chunk(buf, key, centroids, jnp.int32(i))
    fetch(buf[0, :8])
    log(stage="corpus_build", metric="corpus_build_s_12.58M_x768_int8_on_device",
        value=round(time.perf_counter() - t0, 1), unit="s")
    vectors = buf

    scales = jnp.full((N,), 1.0 / 12.0, jnp.float32)  # uniform dequant scale
    index = ItemIndex(
        vectors=vectors, item_ids=np.arange(N), metric="ip",
        centroids=(centroids * 12.0).astype(jnp.float32),
        cluster_items=jnp.arange(N_LIST, dtype=jnp.int32) * CAP,
        cluster_counts=jnp.full((N_LIST,), CAP, jnp.int32),
        nprobe=64, cell_cap=CAP, row_scales=scales,
    )

    # queries: noisy copies of known rows (their true cell is known)
    qk = jax.random.fold_in(key, 999)

    def make_queries(q):
        rows = jnp.arange(q) * (N // q) + 7
        base = vectors[rows].astype(jnp.float32) * scales[rows, None]
        return base + 0.05 * jax.random.normal(qk, (q, DIM)), rows

    # exact oracle: streamed flat int8 scan (small per-call programs; one
    # whole-corpus scan program risks the same compiler stall as the build)
    @jax.jit
    def oracle_step(carry, block, block_start, q):
        vals, idx = carry
        qb = q.astype(jnp.bfloat16)
        s = jnp.dot(qb, block.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32) / 12.0
        ids = block_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        tv, tp = jax.lax.top_k(s, K)
        av = jnp.concatenate([vals, tv], axis=-1)
        ai = jnp.concatenate([idx, jnp.take_along_axis(ids, tp, axis=-1)], axis=-1)
        bv, bp = jax.lax.top_k(av, K)
        return bv, jnp.take_along_axis(ai, bp, axis=-1)

    def flat_oracle(q):
        carry = (jnp.full((q.shape[0], K), -jnp.inf), jnp.zeros((q.shape[0], K), jnp.int32))
        for b in range(n_chunks):
            block = jax.lax.dynamic_slice_in_dim(vectors, b * chunk, chunk)
            carry = oracle_step(carry, block, jnp.int32(b * chunk), q)
        return carry

    for q_batch in (1, 4, 16):
        queries, true_rows = make_queries(q_batch)

        # recall vs exact (oracle on one batch size only; it is expensive)
        if q_batch == 4:
            t0 = time.perf_counter()
            _, oracle_ids = flat_oracle(queries)
            oracle_ids = np.asarray(oracle_ids)
            flat_ms = (time.perf_counter() - t0) * 1000
            s, ids = index.search(np.asarray(queries), K)
            rec = np.mean([
                len(set(ids[i][:10]) & set(oracle_ids[i][:10])) / 10 for i in range(q_batch)
            ])
            hit = float((ids[:, 0] == np.asarray(true_rows)).mean())
            log(stage="recall", metric="ivf_recall10_vs_exact_12.58M",
                value=round(float(rec), 3), true_row_hit_at_1=hit,
                flat_exact_scan_ms=round(flat_ms, 1))

        lat = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            index.search(np.asarray(queries), K)  # includes host fetch of ids
            lat.append((time.perf_counter() - t0) * 1000)
        p50 = float(np.percentile(lat[2:], 50))
        log(stage="latency",
            metric=f"ivf_int8_top{K}_p50_ms_12.58M_x768_batch{q_batch}_nprobe64of8192",
            value=round(p50, 2), unit="ms", per_query_ms=round(p50 / q_batch, 3))


if __name__ == "__main__":
    main()
