"""Probe: can an int8-W8A8 FORWARD lift fine-tune throughput past bf16?

Round-4 verdict weak #3: padded seq-512 fine-tunes (30.1/28.5 samples/s)
trail the A100 absolute (43.9/39.7) while the MXU's int8 rate is measured
at 225 vs 137 TF/s bf16 (bench_probe_int8.py) — but int8 is composed into
the SERVING kernels only. Round-3's lesson says don't wire anything into
the trainer before a probe: XLA-level W8A8 LOST 32% end-to-end at BERT
widths in serving (fusion boundaries around each quant/dequant) while the
same math inside the megakernel WON +28-34%.

This probe measures a TRAINING step (forward + backward + SGD update) of a
BERT-base-shaped 12-layer trunk at the headline fine-tune workload
(bs 16 x group 8 = 128 rows padded to seq 512) in three variants:

  bf16   — plain bf16 GEMMs everywhere (the baseline the trainer runs)
  int8   — forward GEMMs int8 (per-token dynamic activations x per-channel
           weights quantized PER STEP from the fp master), backward
           straight-through in bf16 (custom_vjp: dx = g Wᵀ, dW = xᵀ g)
  int8_noq — int8 GEMMs with the per-step weight-quantization cost
           excluded (weights pre-quantized once) — separates "int8 GEMM
           wins" from "per-step requantization eats the win"

Interpretation: the backward (2/3 of step FLOPs) stays bf16 either way, so
the theoretical ceiling of an int8 forward is ~1.17x end-to-end
(1/3 * (1 - 137/225)). If int8 <= bf16 here, the lever is dead at the XLA
level and BENCH_NOTES records the negative result; if it wins, the next
step is trajectory-parity + trainer wiring.

Run on chip: python bench_probe_int8train.py [tiny]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TINY = "tiny" in sys.argv[1:]
H = 128 if TINY else 768
FF = 256 if TINY else 3072
LAYERS = 2 if TINY else 12
HEADS = 2 if TINY else 12
B = 4 if TINY else 128  # 16 queries x group 8 = 128 rows
L = 64 if TINY else 512
STEPS = 3 if TINY else 10


# -- int8 forward GEMM with straight-through bf16 backward -------------------

def _q_per_token(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax.astype(jnp.float32), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _q_per_channel(w):
    amax = jnp.max(jnp.abs(w), axis=0)
    s = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def int8_matmul(x, w):
    xq, sx = _q_per_token(x)
    wq, sw = _q_per_channel(w)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)


def _fwd(x, w):
    return int8_matmul(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    dx = jnp.einsum("...n,kn->...k", g, w).astype(x.dtype)
    dw = jnp.einsum("...k,...n->kn", x, g).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_fwd, _bwd)


@jax.custom_vjp
def int8_matmul_preq(x, wq, sw, w_master):
    """Pre-quantized weights (wq, sw constant for the step); w_master only
    carries the gradient."""
    xq, sx = _q_per_token(x)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw).astype(x.dtype)


def _fwd_p(x, wq, sw, w_master):
    return int8_matmul_preq(x, wq, sw, w_master), (x, w_master)


def _bwd_p(res, g):
    x, w = res
    dx = jnp.einsum("...n,kn->...k", g, w).astype(x.dtype)
    dw = jnp.einsum("...k,...n->kn", x, g).astype(w.dtype)
    return dx, None, None, dw


int8_matmul_preq.defvjp(_fwd_p, _bwd_p)


# -- the trunk ---------------------------------------------------------------

def init_params(key):
    ks = jax.random.split(key, LAYERS)
    def layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        s = 0.02
        return {
            "qkv": (jax.random.normal(k1, (H, 3 * H)) * s).astype(jnp.bfloat16),
            "o": (jax.random.normal(k2, (H, H)) * s).astype(jnp.bfloat16),
            "up": (jax.random.normal(k3, (H, FF)) * s).astype(jnp.bfloat16),
            "down": (jax.random.normal(k4, (FF, H)) * s).astype(jnp.bfloat16),
        }
    return [layer(k) for k in ks]


def forward(params, x, mode: str, preq=None):
    hd = H // HEADS
    for li, p in enumerate(params):
        if mode == "bf16":
            mm = lambda a, w, name: a @ w  # noqa: E731
        elif mode == "int8":
            mm = lambda a, w, name: int8_matmul(a, w)  # noqa: E731
        else:  # int8_noq
            mm = lambda a, w, name: int8_matmul_preq(  # noqa: E731
                a, preq[li][name][0], preq[li][name][1], w)
        h = x - jnp.mean(x, -1, keepdims=True)
        h = (h / jnp.sqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)).astype(jnp.bfloat16)
        qkv = mm(h, p["qkv"], "qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, HEADS, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, HEADS, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, HEADS, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        x = x + mm(ctx, p["o"], "o")
        h = x - jnp.mean(x, -1, keepdims=True)
        h = (h / jnp.sqrt(jnp.mean(h * h, -1, keepdims=True) + 1e-6)).astype(jnp.bfloat16)
        x = x + mm(jax.nn.gelu(mm(h, p["up"], "up")), p["down"], "down")
    return x


def main():
    key = jax.random.PRNGKey(0)
    params = init_params(key)
    x0 = (jax.random.normal(jax.random.PRNGKey(1), (B, L, H)) * 0.1).astype(jnp.bfloat16)

    results = {}
    for mode in ("bf16", "int8", "int8_noq"):
        preq = None
        if mode == "int8_noq":
            preq = [{n: _q_per_channel(p[n]) for n in p} for p in params]

        def loss_fn(ps, x):
            out = forward(ps, x, mode, preq)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        @jax.jit
        def step(ps, x):
            l, g = jax.value_and_grad(loss_fn)(ps, x)
            ps = jax.tree_util.tree_map(lambda p, gg: p - 1e-3 * gg.astype(p.dtype), ps, g)
            return ps, l

        ps = params
        ps, l = step(ps, x0)  # compile + warm
        l0 = float(l)
        assert np.isfinite(l0), (mode, l0)
        # time by data-dependent fetch (relay: block_until_ready unreliable)
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                ps, l = step(ps, x0)
            lf = float(l)
            trials.append(B * STEPS / (time.perf_counter() - t0))
            assert np.isfinite(lf)
        results[mode] = round(float(np.median(trials)), 2)

    out = {
        "metric": "int8_forward_train_probe_rows_per_sec",
        "unit": "rows/s (fwd+bwd+sgd, padded)",
        "shape": f"{LAYERS}L x {H}H ff{FF}, batch {B} x seq {L}",
        **results,
        "int8_vs_bf16": round(results["int8"] / results["bf16"], 3),
        "int8_noq_vs_bf16": round(results["int8_noq"] / results["bf16"], 3),
        "ceiling_note": "backward stays bf16: theoretical max ~1.17x",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
