"""One-off probe: sustained matmul TF/s on this chip at encoder shapes.

Methodology per CLAUDE.md: long lax.scan chains inside one dispatch, timed
by fetching a data-dependent scalar.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")


def probe(m, k, n, iters=64, dtype=jnp.bfloat16):
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=dtype)
            # keep shapes compatible for chaining: fold back to [m,k]
            return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n))), jnp.sum(y[0, :8])

        x, probes = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(probes)

    float(chain(a, b))  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, b))
        dt = time.perf_counter() - t0
        tf = 2 * m * k * n * iters / dt / 1e12
        best = max(best, tf)
    print(f"[{m}x{k}]@[{k}x{n}] {dtype.__name__}: {best:.1f} TF/s")


if __name__ == "__main__":
    probe(32768, 768, 768)     # encoder dense shape (B*L=32768 tokens)
    probe(32768, 768, 3072)    # MLP up
    probe(32768, 3072, 768)    # MLP down (a@b with k=3072)
    probe(32768, 768, 2304)    # fused qkv
    probe(4096, 4096, 4096)    # the round-1 calibration shape
    probe(8192, 8192, 8192, iters=16)
