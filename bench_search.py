"""Retrieval-latency benchmark: top-100 search over a large corpus on one
chip (the Faiss-replacement datapoint; north star: <10ms p50 top-100 over
100M vectors on v5e-8 — this measures the per-chip building block).

Prints one JSON line per index type.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 5_000_000  # corpus vectors per chip (5M x 256 bf16 = 2.6 GB HBM)
DIM = 256
Q = 4  # queries per request (latency-oriented serving batch)
K = 100
ITERS = 10


def main() -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from nexus_tpu.inference.index import ItemIndex
    from nexus_tpu.ops.topk import brute_force_topk

    # generate ON device: shipping 5 GB through the host relay would dominate.
    # Clustered mixture (2048 latent centers + noise): real embedding spaces
    # are clustered; isotropic gaussians make any IVF useless by construction.
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_corpus(k):
        k1, k2, k3 = jax.random.split(k, 3)
        centers = jax.random.normal(k1, (2048, DIM))
        which = jax.random.randint(k2, (N,), 0, 2048)
        pts = centers[which] + 0.3 * jax.random.normal(k3, (N, DIM))
        return pts.astype(jnp.bfloat16)

    corpus = make_corpus(key)
    # queries = perturbed corpus rows (realistic near-duplicate queries)
    qk = jax.random.fold_in(key, 1)
    queries = (corpus[:Q].astype(jnp.float32)
               + 0.1 * jax.random.normal(qk, (Q, DIM))).astype(jnp.bfloat16)

    @jax.jit
    def flat_search(q, c):
        scores, idx = brute_force_topk(q.astype(jnp.float32), c.astype(jnp.float32), k=K,
                                       block_size=262144)
        return scores, idx

    s, i = flat_search(queries, corpus)
    _ = np.asarray(i)  # sync
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        s, i = flat_search(queries, corpus)
        _ = np.asarray(i[0, 0])
        lat.append((time.perf_counter() - t0) * 1e3)
    q1, p50, q3 = (float(x) for x in np.percentile(lat, [25, 50, 75]))
    print(json.dumps({
        "metric": f"flat_top{K}_p50_ms_{N//1_000_000}M_x{DIM}_batch{Q}",
        "value": round(p50, 2), "unit": "ms", "n": len(lat),
        "iqr": round(q3 - q1, 2),
        "per_query_ms": round(p50 / Q, 3),
    }), flush=True)

    # IVF: nlist=1024 coarse cells, probe 64 (1/16 of the corpus scored)
    t0 = time.perf_counter()
    index = ItemIndex.build(corpus, index_type="ivf", nlist=4096, nprobe=64,
                            dtype=jnp.bfloat16)
    print(json.dumps({"metric": "ivf_build_s_5M", "value": round(time.perf_counter() - t0, 1),
                      "unit": "s"}), flush=True)
    qf = queries.astype(jnp.float32)
    _s, _i = index.search(qf, K)  # compile + warm
    # recall@10 of IVF vs exact
    flat_ids = np.asarray(i)
    ivf_scores, ivf_rows = index.search(qf, K)
    recall = np.mean([
        len(set(ivf_rows[j][:10]) & set(flat_ids[j][:10])) / 10 for j in range(Q)
    ])
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        ivf_scores, ivf_rows = index.search(qf, K)
        _ = np.asarray(ivf_rows[0, 0])
        lat.append((time.perf_counter() - t0) * 1e3)
    q1, p50, q3 = (float(x) for x in np.percentile(lat, [25, 50, 75]))
    print(json.dumps({
        "metric": f"ivf_top{K}_p50_ms_{N//1_000_000}M_x{DIM}_batch{Q}_nprobe64of4096",
        "value": round(p50, 2), "unit": "ms", "n": len(lat),
        "iqr": round(q3 - q1, 2),
        "per_query_ms": round(p50 / Q, 3),
        "recall10_vs_exact": round(float(recall), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
