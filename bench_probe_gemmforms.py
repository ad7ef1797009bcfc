"""Probe 2 (after bench_probe_headattn): WHERE do the attention-shape GEMMs
lose 4x vs the half-lane bound inside Pallas?

bench_probe_headattn measured the full attention segment at 20-24.5 TF/s on
chip (vs ~98 TF/s naive bound for d=64 shapes). This isolates the MXU rate
of each GEMM FORM inside a minimal Pallas program — operands VMEM-resident,
32 chained GEMMs per program, no softmax — so kernel-composition effects
(softmax VPU time, casts, HBM streaming) are excluded:

  score_nt      dot_general(q[512,64], k[512,64], contract dims (1,1))
  score_nn      k pre-transposed [64,512], contract (1,0) — Mosaic-native nn
  d128_nn       [512,128]x[128,512] control (full contraction lanes)
  av_nn         p[512,512]bf16 x v[512,64] (output lanes half)
  av_nn_128     p[512,512] x v[512,128] control (full output lanes)
  sq512         [512,512]x[512,512] control (the shape Mosaic loves)

Run: python bench_probe_gemmforms.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402

_CPU = jax.default_backend() == "cpu"
BH = 4 if _CPU else 768  # grid size (B=64 x H=12 of the encode workload)
ITERS = 2 if _CPU else 32
OUTW = 128  # small per-program output so writes never dominate


def _kernel(a_ref, b_ref, o_ref, *, form: str):
    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros((a.shape[0], OUTW), jnp.float32)
    for _ in range(ITERS):
        if form == "score_nt":
            s = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:  # nn forms: contract a's last dim with b's first
            s = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        # fold back to keep a data dependency without changing shapes
        w = min(s.shape[1], a.shape[1])
        upd = s[:, :w] * 1e-6
        if w < a.shape[1]:
            upd = jnp.pad(upd, ((0, 0), (0, a.shape[1] - w)))
        a = (a + upd).astype(a.dtype)
        acc = acc + s[:, :OUTW] if s.shape[1] >= OUTW else acc + jnp.pad(
            s, ((0, 0), (0, OUTW - s.shape[1])))
    o_ref[:] = acc.astype(o_ref.dtype)


def probe(label: str, m: int, kdim: int, n: int, form: str):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((BH, m, kdim)), jnp.bfloat16)
    bshape = (BH, n, kdim) if form == "score_nt" else (BH, kdim, n)
    b = jnp.asarray(rng.standard_normal(bshape), jnp.bfloat16)

    grid = (BH,)
    fn = pl.pallas_call(
        functools.partial(_kernel, form=form),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, m, kdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((None,) + bshape[1:], lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, m, OUTW), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, m, OUTW), jnp.float32),
        interpret=_CPU,
    )
    jfn = jax.jit(fn)
    out = jfn(a, b)
    float(jnp.sum(out[0, 0]))  # sync
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(a, b)
        float(jnp.sum(out[0, 0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    flops = 2 * BH * m * kdim * n * ITERS
    print(f"{label:<14s} [{m},{kdim}]x[{kdim},{n}] {form:<9s} "
          f"{best * 1e3:8.1f} ms  {flops / best / 1e12:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    probe("score_nt", 512, 64, 512, "score_nt")
    probe("score_nn", 512, 64, 512, "score_nn")
    probe("d128_nn", 512, 128, 512, "nn")
    probe("av_nn", 512, 512, 64, "nn")
    probe("av_nn_128", 512, 512, 128, "nn")
    probe("sq512", 512, 512, 512, "nn")
