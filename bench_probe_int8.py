"""One-off probe: int8 x int8 -> int32 MXU rate vs bf16 at encoder shapes.

Three variants per shape, all timed as long lax.scan chains in one dispatch
(CLAUDE.md methodology):
  - bf16: the baseline GEMM (peak 197 TF/s on v5e)
  - int8_raw: pure int8 dot_general, int32 accumulation (peak 394 TOPS) —
    the MXU ceiling XLA can reach when operands are already quantized
  - int8_w8a8: the full QuantDense step (per-token activation quantize +
    int8 GEMM + dequant) — what the serving path actually pays per layer

Context: bench.py headline_int8 measured the W8A8 encode SLOWER than bf16
(11,279 vs 16,503 emb/s). This probe separates "XLA can't hit the int8
MXU rate" from "the quantize/dequantize VPU work swamps the GEMM gain".
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")


def _time_chain(chain, *args, flops_per_iter, iters):
    from nexus_tpu.utils.benchstats import measure_trials

    float(chain(*args))  # compile + warm

    def one():
        t0 = time.perf_counter()
        float(chain(*args))
        return flops_per_iter * iters / (time.perf_counter() - t0) / 1e12

    return measure_trials(one)["value"]  # median of N_TRIALS (relay variance)


def probe(m, k, n, iters=64):
    flops = 2 * m * k * n
    res = {}

    a16 = jnp.ones((m, k), jnp.bfloat16)
    b16 = jnp.ones((k, n), jnp.bfloat16)

    @jax.jit
    def chain_bf16(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            x2 = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return x2, jnp.sum(y[0, :8])
        _, p = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(p)

    res["bf16"] = _time_chain(chain_bf16, a16, b16,
                              flops_per_iter=flops, iters=iters)

    a8 = jnp.ones((m, k), jnp.int8)
    b8 = jnp.ones((k, n), jnp.int8)

    @jax.jit
    def chain_int8(a, b):
        def body(x, _):
            y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y8 = jnp.clip(y, -127, 127).astype(jnp.int8)
            x2 = y8[:, :k] if n >= k else jnp.pad(y8, ((0, 0), (0, k - n)))
            return x2, jnp.sum(y[0, :8])
        _, p = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(p)

    res["int8_raw"] = _time_chain(chain_int8, a8, b8,
                                  flops_per_iter=flops, iters=iters)

    s_w = jnp.ones((n,), jnp.float32)

    @jax.jit
    def chain_w8a8(x0, b, s):
        def body(x, _):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            s_a = jnp.maximum(amax, 1e-6) / 127.0
            xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            yf = (y.astype(jnp.float32) * s_a * s).astype(jnp.bfloat16)
            x2 = yf[:, :k] if n >= k else jnp.pad(yf, ((0, 0), (0, k - n)))
            return x2, jnp.sum(yf[0, :8])
        _, p = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(p)

    res["int8_w8a8"] = _time_chain(chain_w8a8, a16, b8, s_w,
                                   flops_per_iter=flops, iters=iters)

    print(f"[{m}x{k}]@[{k}x{n}]  " +
          "  ".join(f"{kk}: {v:6.1f} TF/s" for kk, v in res.items()),
          flush=True)


if __name__ == "__main__":
    small = len(sys.argv) > 1 and sys.argv[1] == "small"
    shapes = ([(32768, 768, 768)] if small else
              [(32768, 768, 768),    # encoder dense (B*L=32768 tokens)
               (32768, 768, 3072),   # MLP up
               (32768, 3072, 768),   # MLP down
               (32768, 768, 2304),   # fused qkv
               (4096, 4096, 4096),   # calibration
               (8192, 8192, 8192)])  # fat calibration
    for m, k, n in shapes:
        probe(m, k, n, iters=16 if m >= 8192 and k >= 8192 else 64)
