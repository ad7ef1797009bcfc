"""At-scale retrieval latency: top-100 over 12.58M x 768 int8 vectors on ONE
chip — the per-chip building block of the <10 ms p50 / 100M-vector north star
(8 x 12.58M = 100.6M on v5e-8; the cross-chip step is one all_gather of
8 x [Q, 100] merged on every chip — microseconds on ICI, validated on the
8-device CPU mesh in tests/test_inference.py::test_sharded_ivf_matches_single_device).

The corpus is synthesized ON DEVICE directly in the cell-contiguous int8
layout (a host->relay transfer of 9.6 GB would dominate; a 12.5M-row f32
intermediate would not fit 16 GB). Cells are well-separated clusters so
recall@10 against the exact int8 flat scan is meaningful.

Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LIST = 8192
CAP = 1536
N = N_LIST * CAP  # 12,582,912
DIM = 768
K = 100
ITERS = 12


def fetch(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from nexus_tpu.inference.index import ItemIndex

    key = jax.random.PRNGKey(0)
    centroids = jax.random.normal(key, (N_LIST, DIM)) * 3.0

    chunk = CAP * 128  # 196,608 rows per build step
    n_chunks = N // chunk

    # ONE jit call builds the whole corpus on device (lax.map over chunks):
    # per-call writes through the relay would round-trip the 9.6 GB buffer
    @jax.jit
    def build(key, centroids):
        def chunk_fn(i):
            cells = (i * chunk + jnp.arange(chunk)) // CAP
            rows = centroids[cells] * 12.0 + 8.0 * jax.random.normal(
                jax.random.fold_in(key, i), (chunk, DIM)
            )
            return jnp.clip(jnp.round(rows), -127, 127).astype(jnp.int8)

        return jax.lax.map(chunk_fn, jnp.arange(n_chunks)).reshape(N, DIM)

    t0 = time.perf_counter()
    vectors = build(key, centroids)
    fetch(vectors[0, :8])
    print(json.dumps({"metric": "corpus_build_s_12.58M_x768_int8_on_device",
                      "value": round(time.perf_counter() - t0, 1), "unit": "s"}),
          flush=True)

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

    # exact oracle: flat int8 scan (bf16 dequant in-block)
    @jax.jit
    def flat_oracle(q):
        blocks = vectors.reshape(N // chunk, chunk, DIM)
        qb = q.astype(jnp.bfloat16)

        def step(carry, inp):
            vals, idx = carry
            bid, block = inp
            s = jnp.dot(qb, block.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32) / 12.0
            ids = bid * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            av = jnp.concatenate([vals, *(jax.lax.top_k(s, K)[0:1])], axis=-1)
            ai = jnp.concatenate(
                [idx, jnp.take_along_axis(ids, jax.lax.top_k(s, K)[1], axis=-1)], axis=-1
            )
            bv, bp = jax.lax.top_k(av, K)
            return (bv, jnp.take_along_axis(ai, bp, axis=-1)), None

        init = (jnp.full((q.shape[0], K), -jnp.inf), jnp.zeros((q.shape[0], K), jnp.int32))
        (v, i), _ = jax.lax.scan(step, init, (jnp.arange(N // chunk), blocks))
        return v, i

    for q_batch in (1, 4, 16):
        queries, true_rows = make_queries(q_batch)

        # recall vs exact (oracle on the largest batch only; it is expensive)
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
            print(json.dumps({"metric": "ivf_recall10_vs_exact_12.58M", "value": round(rec, 3),
                              "true_row_hit@1": hit,
                              "flat_exact_scan_ms": round(flat_ms, 1)}), flush=True)

        lat = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            index.search(np.asarray(queries), K)  # includes host fetch of ids
            lat.append((time.perf_counter() - t0) * 1000)
        p50 = float(np.percentile(lat[2:], 50))
        print(json.dumps({
            "metric": f"ivf_int8_top{K}_p50_ms_12.58M_x768_batch{q_batch}_nprobe64of8192",
            "value": round(p50, 2), "unit": "ms",
            "per_query_ms": round(p50 / q_batch, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
