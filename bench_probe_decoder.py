"""Isolated decoder-stack probe: the fused decoder megakernel vs flash vs XLA.

Measures sustained TF/s through an N-layer GQA decoder stack (attention
block + SwiGLU MLP; the MLP always runs in XLA — see ops/fused_decoder.py
for why it stays out of the kernel) at a Llama/Qwen-1B-class shape:
H=2048, 16 query / 8 KV heads, head_dim 128, L=512, bf16. This is the
persistent form of the one-off /tmp probe BENCH_NOTES cites, so the
mega-vs-flash-vs-xla attribution can be re-taken on any chip session:

    python bench_probe_decoder.py            # TPU throughput, all variants
    python bench_probe_decoder.py parity     # CPU: mega vs flash vs xla

Methodology per CLAUDE.md: layers chained through lax.scan inside ONE
dispatch (stacked weights), repeats inside the same dispatch, timing by
fetching a data-dependent scalar; median of >= 5 trials + IQR
(nexus_tpu/utils/benchstats.py).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")

from nexus_tpu.ops import fused_decoder as fd  # noqa: E402
from nexus_tpu.utils.benchstats import measure_trials  # noqa: E402

BIG = dict(b=8, l=512, h=2048, nq=16, nkv=8, d=128, ff=8192, layers=8)
TINY = dict(b=2, l=256, h=256, nq=4, nkv=2, d=64, ff=512, layers=2)


def _weights(rng, cfg, dtype=jnp.bfloat16):
    """One layer's weights, scaled for unit-variance activations."""
    h, nq, nkv, d, ff = cfg["h"], cfg["nq"], cfg["nkv"], cfg["d"], cfg["ff"]
    qw = (nq + 2 * nkv) * d
    ks = jax.random.split(rng, 5)
    s = lambda k, shape, fan: (  # noqa: E731
        jax.random.normal(k, shape, jnp.float32) / np.sqrt(fan)).astype(dtype)
    return dict(
        wqkv=s(ks[0], (h, qw), h),
        wo=s(ks[1], (nq * d, h), nq * d),
        rms_w=jnp.ones((h,), jnp.float32),
        wgate=s(ks[2], (h, ff), h),
        wup=s(ks[3], (h, ff), h),
        wdown=s(ks[4], (ff, h), ff),
        rms2_w=jnp.ones((h,), jnp.float32),
    )


def _mlp(x, w, eps=1e-6):
    """Pre-norm SwiGLU MLP + residual (XLA in every variant)."""
    xf = x.astype(jnp.float32)
    xn = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
          * w["rms2_w"][None, None, :]).astype(x.dtype)
    g = jnp.dot(xn, w["wgate"], preferred_element_type=jnp.float32)
    u = jnp.dot(xn, w["wup"], preferred_element_type=jnp.float32)
    act = (jax.nn.silu(g) * u).astype(x.dtype)
    dn = jnp.dot(act, w["wdown"], preferred_element_type=jnp.float32)
    return (xf + dn).astype(x.dtype)


def _attn_xla(x, w, lengths, cfg, eps=1e-6):
    """Plain-XLA attention block: materialized [B, nq, L, L] f32 probs —
    the pre-flash baseline the megakernel/flash numbers are read against."""
    b, l, h = x.shape
    nq, nkv, d = cfg["nq"], cfg["nkv"], cfg["d"]
    xf = x.astype(jnp.float32)
    xn = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
          * w["rms_w"][None, None, :]).astype(x.dtype)
    qkv = jnp.dot(xn, w["wqkv"], preferred_element_type=jnp.float32
                  ).astype(x.dtype)
    q = qkv[..., : nq * d].reshape(b, l, nq, d)
    k = qkv[..., nq * d:(nq + nkv) * d].reshape(b, l, nkv, d)
    v = qkv[..., (nq + nkv) * d:].reshape(b, l, nkv, d)
    cos, sin = fd.iota_rope_tables(l, d, 10000.0)
    c4, s4 = cos[:, :, None, :], sin[:, :, None, :]

    def rope4(t):
        tf = t.astype(jnp.float32)
        rot = jnp.concatenate([-tf[..., d // 2:], tf[..., : d // 2]], -1)
        return (tf * c4 + rot * s4).astype(t.dtype)

    q, k = rope4(q), rope4(k)
    rep = nq // nkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(d)
    pos = jnp.arange(l)
    valid = pos[None, :] < lengths[:, None]                      # [B, L]
    allow = (pos[None, :] <= pos[:, None])[None, None] & \
        valid[:, None, None, :]
    s = jnp.where(allow, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhlm,bmhd->blhd", p.astype(x.dtype), v,
                     preferred_element_type=jnp.float32)
    ctx = jnp.where(valid[:, :, None, None], ctx, 0).reshape(b, l, nq * d)
    out = jnp.dot(ctx.astype(x.dtype), w["wo"],
                  preferred_element_type=jnp.float32)
    return (xf + out).astype(x.dtype)


def _attn_flash(x, w, lengths, cfg, eps=1e-6):
    zeros = jnp.zeros(((cfg["nq"] + 2 * cfg["nkv"]) * cfg["d"],), jnp.float32)
    ones = jnp.ones((cfg["d"],), jnp.float32)
    cos, sin = fd.iota_rope_tables(x.shape[1], cfg["d"], 10000.0)
    return fd._unfused_reference(
        x, w["wqkv"], zeros, w["wo"], w["rms_w"], ones, ones, cos, sin,
        lengths, cfg["nq"], cfg["nkv"], cfg["d"], eps, False)


def _attn_mega(x, w, lengths, cfg, eps=1e-6):
    return fd.fused_decoder_attention(
        x, w["wqkv"], w["wo"], w["rms_w"], lengths,
        num_q_heads=cfg["nq"], num_kv_heads=cfg["nkv"], head_dim=cfg["d"],
        eps=eps)


ATTN = {"mega": _attn_mega, "flash": _attn_flash, "xla": _attn_xla}


def _stack_fn(impl, cfg, repeats=1):
    attn = ATTN[impl]

    @jax.jit
    def run(x, stacked, lengths):
        def layer(h, w):
            h = attn(h, w, lengths, cfg)
            return _mlp(h, w), None

        def rep(h, _):
            h, _ = jax.lax.scan(layer, h, stacked)
            return h, jnp.sum(h[0, 0, :8].astype(jnp.float32))

        x, probes = jax.lax.scan(rep, x, None, length=repeats)
        return jnp.sum(probes)

    return run


def _flops(cfg):
    b, l, h = cfg["b"], cfg["l"], cfg["h"]
    nq, nkv, d, ff = cfg["nq"], cfg["nkv"], cfg["d"], cfg["ff"]
    qw = (nq + 2 * nkv) * d
    per_layer = (2 * b * l * h * qw            # qkv
                 + 2 * 2 * b * nq * l * l * d  # scores + ctx (upper bound:
                 + 2 * b * l * nq * d * h      # o   causal halves the real)
                 + 3 * 2 * b * l * h * ff)     # gate/up/down
    return per_layer * cfg["layers"]


def _inputs(cfg):
    rng = jax.random.PRNGKey(0)
    kx, kw, kl = jax.random.split(rng, 3)
    x = (jax.random.normal(kx, (cfg["b"], cfg["l"], cfg["h"]), jnp.float32)
         ).astype(jnp.bfloat16)
    stacked = jax.tree.map(
        lambda *ts: jnp.stack(ts),
        *[_weights(k, cfg) for k in jax.random.split(kw, cfg["layers"])])
    lengths = jax.random.randint(kl, (cfg["b"],), cfg["l"] // 2, cfg["l"] + 1
                                 ).astype(jnp.int32)
    return x, stacked, lengths


def parity() -> None:
    jax.config.update("jax_platforms", "cpu")
    cfg = TINY
    x, stacked, lengths = _inputs(cfg)
    outs = {}
    for impl in ATTN:
        run = _stack_fn(impl, cfg)
        # reuse the timing chain but grab the full tensor for comparison
        def full(x, stacked, lengths, _impl=impl):
            h = x
            ws = [jax.tree.map(lambda t, i=i: t[i], stacked)
                  for i in range(cfg["layers"])]
            for w in ws:
                h = ATTN[_impl](h, w, lengths, cfg)
                h = _mlp(h, w)
            return h
        outs[impl] = np.asarray(full(x, stacked, lengths), np.float32)
        float(run(x, stacked, lengths))  # the jitted chain also executes
    ref = outs["xla"]
    ok = True
    for impl in ("mega", "flash"):
        rel = (np.linalg.norm(outs[impl] - ref)
               / max(np.linalg.norm(ref), 1e-9))
        print(f"parity {impl} vs xla: rel {rel:.4%}")
        ok &= rel < 0.02
    print(json.dumps({"parity_ok": bool(ok)}))
    sys.exit(0 if ok else 1)


def main() -> None:
    cfg = BIG
    x, stacked, lengths = _inputs(cfg)
    repeats = 4
    tflop = _flops(cfg) * repeats / 1e12
    results = {}
    for impl in ("mega", "flash", "xla"):
        run = _stack_fn(impl, cfg, repeats)
        float(run(x, stacked, lengths))  # compile

        def one(run=run):
            t0 = time.perf_counter()
            float(run(x, stacked, lengths))
            return tflop / (time.perf_counter() - t0)

        st = measure_trials(one)
        results[impl] = st
        print(f"{impl:6s}: {st['value']:.1f} TF/s (n={st['n']}, "
              f"iqr {st['iqr']:.1f}, min {st['min']:.1f}, max {st['max']:.1f})")
    line = {
        "metric": "decoder_stack_tflops_mega",
        "value": round(results["mega"]["value"], 1),
        "unit": "TF/s",
        "vs_flash": round(results["mega"]["value"]
                          / max(results["flash"]["value"], 1e-9), 3),
        "vs_xla": round(results["mega"]["value"]
                        / max(results["xla"]["value"], 1e-9), 3),
        "n": results["mega"]["n"],
        "iqr": results["mega"]["iqr"],
    }
    print(json.dumps(line))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parity":
        parity()
    else:
        main()
