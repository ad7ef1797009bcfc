"""Probe: why do the d=64 attention GEMMs run at ~35 TF/s (BENCH_NOTES
"Seq-512 corpus encode"), and which kernel layout fixes it?

At BERT-base seq-512 the attention score GEMM is [512,64]x[64,512] and the
AV GEMM is [512,512]x[512,64]: each contracts or outputs over only 64 of
the MXU's 128 lanes, so the naive bound is ~50% of peak (~98 TF/s) — yet
the measured effective rate inside the megakernel is ~35 TF/s. This probe
separates the candidate causes on real hardware:

  A. isolated GEMM rate at the exact shapes (XLA level, chained scan)
     - score shape, AV shape, d=128 control, transpose-vs-dot_general form
  B. the same GEMMs inside a minimal Pallas program (Mosaic codegen),
     one head per program vs H heads unrolled per program (MXU/VPU overlap)
  C. full attention segment (scores+mask+softmax+AV) in three layouts:
     xla / per-head-grid flash / heads-in-program (the megakernel layout)

Methodology per CLAUDE.md: 20-step lax.scan chains inside one dispatch,
timed by fetching a data-dependent scalar; best of 3.

Run: python bench_probe_headattn.py [quick|full]
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402

B, H, L, D = 64, 12, 512, 64
ITERS = 20


def _time(fn, *args, flops=None, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), out)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))  # sync
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    tf = flops / best / 1e12 if flops else 0.0
    print(f"{label:<46s} {best * 1e3:8.1f} ms  {tf:7.1f} TF/s", flush=True)
    return best


# ---------------------------------------------------------------------------
# A. isolated GEMM shapes, XLA level
# ---------------------------------------------------------------------------

def probe_gemms():
    print("== A: isolated GEMM rates (XLA, chained) ==")
    rng = np.random.default_rng(0)

    def chain_gemm(m, k, n, *, form, label, bh=B * H):
        # bh independent GEMMs per step (the per-layer head count x batch)
        a = jnp.asarray(rng.standard_normal((bh, m, k)), jnp.bfloat16)
        bmat = jnp.asarray(rng.standard_normal((bh, n, k)), jnp.bfloat16)

        @jax.jit
        def run(a, bmat):
            def body(x, _):
                if form == "dot_nt":  # a @ b.T via dot_general, no transpose
                    s = jax.lax.dot_general(
                        x, bmat, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                elif form == "transpose":  # jnp einsum with explicit .T
                    s = jnp.einsum("bmk,bnk->bmn", x, bmat,
                                   preferred_element_type=jnp.float32)
                else:
                    raise ValueError(form)
                # fold back to keep the chain data-dependent, same shape
                upd = (s[:, :, :k].astype(jnp.bfloat16) * 1e-3)[:, :m, :]
                return x + upd, s[0, 0, 0]
            x, probes = jax.lax.scan(body, a, None, length=ITERS)
            return jnp.sum(probes) + jnp.sum(x[0, 0])

        flops = 2 * bh * m * k * n * ITERS
        _time(run, a, bmat, flops=flops, label=label)

    # score GEMM shape: [512,64] x [64,512] (contract d=64)
    chain_gemm(L, D, L, form="dot_nt", label=f"score [L,{D}]x[{D},L] dot_general")
    chain_gemm(L, D, L, form="transpose", label=f"score [L,{D}]x[{D},L] einsum")
    # d=128 control: same output, double contraction
    chain_gemm(L, 128, L, form="dot_nt", label="score d=128 control", )
    # AV GEMM shape: [512,512] x [512,64] (output N=64)
    def chain_av():
        p = jnp.asarray(rng.standard_normal((B * H, L, L)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B * H, L, D)), jnp.bfloat16)

        @jax.jit
        def run(p, v):
            def body(x, _):
                o = jax.lax.dot_general(x, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                return x + jnp.pad(o.astype(jnp.bfloat16) * 1e-3,
                                   ((0, 0), (0, 0), (0, L - D))), o[0, 0, 0]
            x, probes = jax.lax.scan(body, p, None, length=ITERS)
            return jnp.sum(probes) + jnp.sum(x[0, 0])

        _time(run, p, v, flops=2 * B * H * L * L * D * ITERS,
              label=f"AV [L,L]x[L,{D}] dot_general")
    chain_av()


# ---------------------------------------------------------------------------
# B/C. attention segment in three layouts
# ---------------------------------------------------------------------------

def _xla_attn(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _headgroup_kernel(q_ref, k_ref, v_ref, o_ref, *, g):
    # q/k/v_ref: [G, L, D] — G heads of one batch row per program
    for hd in range(g):
        q = q_ref[hd]
        k = k_ref[hd]
        v = v_ref[hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / math.sqrt(D))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[hd] = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def headgroup_attn(q, k, v, g):
    b, h, l, d = q.shape
    grid = (b, h // g)
    spec = pl.BlockSpec((None, g, l, d), lambda bi, gi: (bi, gi, 0, 0))
    return pl.pallas_call(
        functools.partial(_headgroup_kernel, g=g),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)


def probe_attention(parity_only=False):
    print("== C: full attention segment layouts ==")
    from nexus_tpu.ops.flash_attention import flash_attention_padded

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    lens = jnp.full((B,), L, jnp.int32)

    # parity first (tiny tolerance: same math, different association)
    for g in (1, 2, 4, 12):
        got = headgroup_attn(q[:2], k[:2], v[:2], g)
        want = _xla_attn(q[:2], k[:2], v[:2])
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        assert err < 2e-2, (g, err)
    print("headgroup parity vs xla OK (g=1,2,4,12)")
    if parity_only:
        return

    flops = 4 * B * H * L * L * D * ITERS  # scores + AV

    def chain(fn, label):
        @jax.jit
        def run(q, k, v):
            def body(x, _):
                o = fn(x, k, v)
                return (x + o * 1e-3).astype(x.dtype), o[0, 0, 0, 0]
            x, probes = jax.lax.scan(body, q, None, length=ITERS)
            return jnp.sum(probes) + jnp.sum(x[0, 0, 0])
        _time(run, q, k, v, flops=flops, label=label)

    chain(_xla_attn, "xla materialized-probs")
    chain(lambda a, b, c: flash_attention_padded(a, b, c, lens),
          "flash per-head grid (128/128)")
    chain(lambda a, b, c: flash_attention_padded(a, b, c, lens, 512, 512),
          "flash per-head grid (512/512 whole-row)")
    for g in (1, 2, 4, 6, 12):
        chain(lambda a, b, c, g=g: headgroup_attn(a, b, c, g),
              f"headgroup kernel g={g}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    if mode == "parity":
        probe_attention(parity_only=True)
    else:
        probe_gemms()
        probe_attention()
