"""Fused encoder attention block — the transformer-layer megakernel.

ONE Pallas program per batch row computes the whole attention sub-block:

    y = LayerNorm(x + (attention(x @ Wqkv) @ Wo + bo))

i.e. QKV projection, all heads' softmax attention, output projection,
residual and LayerNorm, with every intermediate living in VMEM. This is the
"fused attention+MLP megakernel" lever named in BENCH_NOTES/ROADMAP: the
unfused path pays four HBM transposes around the flash kernel plus XLA
fusion boundaries on either side, which cap the in-model GEMM rate at
~87-103 TF/s; owning the projections removes both. Measured on one v5e
(12-layer BERT-base stack, bf16): 151 TF/s at [64, 512] and 152 TF/s at
[256, 128] vs 87 (flash path) / 78-101 (XLA) — 1.5-1.7x end to end.

Why heads can live INSIDE one program here when a layout-native flash
kernel could not (BENCH_NOTES r3 negative result): the per-head split
happens on a VMEM-resident [L, 3H] value with static 64-offset lane
slices, which Mosaic relayouts handle — there is no [B, L, H, D] HBM
block-spec to tile, and no shape-cast stores.

Masking comes in the same two flavors as ops/flash_attention.py:
  - ``lengths`` [B] int32 — right-padded rows (keys at pos >= length hidden);
  - ``segment_ids`` [B, L] int — packed rows (attend within own segment only).

The op is differentiable via custom_vjp. The backward is ITSELF a
megakernel (`_pallas_fused_bwd`): one program per batch row recomputes
the forward in VMEM (from the saved layer input only — remat-grade
O(L·H) residuals) and produces dx plus ALL weight gradients, with the
weight-grad accumulators living in VMEM across the sequential TPU grid
(constant-index output blocks, initialized at program 0). This removes
the XLA fusion boundaries and HBM transposes from the backward as well —
previously the bwd fell back to re-running the UNFUSED flash graph under
jax.vjp, which capped training throughput at the unfused rate and is
kept only as the fallback for shapes the bwd VMEM gate rejects. Note
dropout cannot run inside the kernel; callers gate the fused path on
dropout == 0 (the flash-attn training convention) — models/bert.py does.

Reference role parity: the attention compute path of the HF encoder the
reference fine-tunes (Nexus/training/embedder/text_retrieval/runner.py:94).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ln_f32(res, gamma, beta, eps):
    """f32 LayerNorm over the last axis; gamma/beta broadcast over any rank."""
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    return (res - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


_ACTS = {"gelu": jax.nn.gelu, "gelu_new": jax.nn.gelu, "relu": jax.nn.relu}


def _attn_core(x, wqkv, bqkv, wo, bo, gamma, beta, allowed, *, heads, eps,
               out_dtype, q_valid=None, drop1=None):
    """Shared kernel body. x: [L, H] bf16 (VMEM value), allowed: [L, L] bool
    key-mask (True = attend). ``q_valid`` [L, 1] bool zeroes the attention
    context at invalid QUERY rows — required in padded mode so the fused
    forward matches the flash recompute graph (flash_attention_padded zeroes
    pad query rows) everywhere, keeping the custom-vjp gradient exact even
    for cotangents that touch pad positions. ``drop1`` [L, H] is an inverted
    dropout multiplier (bernoulli/(1-p), generated OUTSIDE the kernel from a
    PRNG key so fwd/bwd see identical masks) applied to the attention output
    before the residual — the position nn.Dropout holds in the unfused
    layer. Returns y: [L, H]."""
    l, h = x.shape
    d = h // heads
    scale = 1.0 / math.sqrt(d)
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[None, :]).astype(x.dtype)  # [L, 3H]
    ctx_parts = []
    for hd in range(heads):
        q = qkv[:, hd * d:(hd + 1) * d]
        k = qkv[:, h + hd * d: h + (hd + 1) * d]
        v = qkv[:, 2 * h + hd * d: 2 * h + (hd + 1) * d]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)  # fully-masked rows: exp(0) = 1 -> uniform, finite
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_parts, axis=-1)  # [L, H] f32
    if q_valid is not None:
        ctx = jnp.where(q_valid, ctx, 0.0)
    out = jnp.dot(ctx.astype(x.dtype), wo,
                  preferred_element_type=jnp.float32) + bo[None, :]
    if drop1 is not None:
        out = out * drop1.astype(jnp.float32)
    y = _ln_f32(x.astype(jnp.float32) + out, gamma, beta, eps)
    return y.astype(out_dtype)


def _layer_core(x, w, allowed, *, heads, eps, act, out_dtype, q_valid=None,
                drop1=None, drop2=None):
    """Full encoder layer: attention block + FFN + both LayerNorms.
    w = (wqkv, bqkv, wo, bo, g1, b1, wup, bup, wdown, bdown, g2, b2);
    drop1/drop2: [L, H] inverted-dropout multipliers at the two nn.Dropout
    sites (attention output / FFN output, both before their residual)."""
    wqkv, bqkv, wo, bo, g1, b1, wup, bup, wdown, bdown, g2, b2 = w
    h1 = _attn_core(x, wqkv, bqkv, wo, bo, g1, b1, allowed,
                    heads=heads, eps=eps, out_dtype=x.dtype, q_valid=q_valid,
                    drop1=drop1)
    up = jnp.dot(h1, wup, preferred_element_type=jnp.float32)
    up = _ACTS[act](up + bup[None, :]).astype(x.dtype)
    dn = jnp.dot(up, wdown, preferred_element_type=jnp.float32) + bdown[None, :]
    if drop2 is not None:
        dn = dn * drop2.astype(jnp.float32)
    y = _ln_f32(h1.astype(jnp.float32) + dn, g2, b2, eps)
    return y.astype(out_dtype)


def _padded_kernel(lens_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                   gamma_ref, beta_ref, *rest, heads, eps):
    *drop_refs, y_ref = rest
    x = x_ref[:]
    l = x.shape[0]
    length = lens_ref[pl.program_id(0)]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    y_ref[:] = _attn_core(
        x, wqkv_ref[:], bqkv_ref[0], wo_ref[:], bo_ref[0],
        gamma_ref[0], beta_ref[0], kpos < length,
        heads=heads, eps=eps, out_dtype=y_ref.dtype, q_valid=qpos < length,
        drop1=drop_refs[0][:] if drop_refs else None,
    )


def _segment_kernel(seg_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                    gamma_ref, beta_ref, *rest, heads, eps):
    *drop_refs, y_ref = rest
    x = x_ref[:]
    seg = seg_ref[0, :]  # [L]
    allowed = (seg[None, :] == seg[:, None]) & (seg[None, :] > 0)
    y_ref[:] = _attn_core(
        x, wqkv_ref[:], bqkv_ref[0], wo_ref[:], bo_ref[0],
        gamma_ref[0], beta_ref[0], allowed,
        heads=heads, eps=eps, out_dtype=y_ref.dtype,
        drop1=drop_refs[0][:] if drop_refs else None,
    )


def _f32row(t):
    return jnp.asarray(t, jnp.float32).reshape(1, -1)


def _gen_drops(rng, rate, shape, dtype, n):
    """n inverted-dropout multiplier arrays (bernoulli/(1-p)) derived from
    ``rng``. Generated OUTSIDE the kernels and regenerated from the saved
    key in the backward — fwd and bwd see bit-identical masks with no mask
    residuals stored."""
    if not rate or rng is None:
        return ()
    keys = jax.random.split(rng, n)
    return tuple(
        (jax.random.bernoulli(k, 1.0 - rate, shape).astype(jnp.float32)
         / (1.0 - rate)).astype(dtype)
        for k in keys)


def _pallas_fused(x, wqkv, bqkv, wo, bo, gamma, beta, mask, heads, eps,
                  seg_mode, drops=()):
    b, l, h = x.shape
    # lane-pad L so the [L, L] score tile is legal; padded keys are masked
    # (iota >= length / segment 0) and padded query rows are sliced off
    l_pad = -(-l // 128) * 128
    orig_l = l
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        drops = tuple(jnp.pad(d, ((0, 0), (0, l_pad - l), (0, 0)))
                      for d in drops)
        if seg_mode:
            mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)))
        l = l_pad
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    weight_specs = [  # index maps take (*grid, *scalar) args — all ignored
        pl.BlockSpec((h, 3 * h), lambda *a: (0, 0)),
        pl.BlockSpec((1, 3 * h), lambda *a: (0, 0)),
        pl.BlockSpec((h, h), lambda *a: (0, 0)),
        pl.BlockSpec((1, h), lambda *a: (0, 0)),
        pl.BlockSpec((1, h), lambda *a: (0, 0)),
        pl.BlockSpec((1, h), lambda *a: (0, 0)),
    ]
    row_spec = pl.BlockSpec((None, l, h), lambda i, *a: (i, 0, 0))
    drop_specs = [row_spec] * len(drops)
    args = (x, wqkv, _f32row(bqkv), wo, _f32row(bo), _f32row(gamma),
            _f32row(beta), *drops)
    if seg_mode:
        out = pl.pallas_call(
            functools.partial(_segment_kernel, heads=heads, eps=eps),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((None, 1, l), lambda i: (i, 0, 0)),
                row_spec,
                *weight_specs,
                *drop_specs,
            ],
            out_specs=row_spec,
            **common,
        )(mask.astype(jnp.int32).reshape(b, 1, l), *args)
    else:
        out = pl.pallas_call(
            functools.partial(_padded_kernel, heads=heads, eps=eps),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=[row_spec, *weight_specs, *drop_specs],
                out_specs=row_spec,
            ),
            **common,
        )(jnp.clip(mask.astype(jnp.int32), 0, orig_l), *args)
    return out[:, :orig_l, :]


def _unfused_reference(x, wqkv, bqkv, wo, bo, gamma, beta, mask, heads, eps,
                       seg_mode, drop1=None):
    """The same math through the blocked flash kernels (O(L·D) memory) —
    used by the fallback custom backward as the recompute graph, and by
    tests as the numerical oracle."""
    from nexus_tpu.ops.flash_attention import (flash_attention,
                                               flash_attention_padded)

    b, l, h = x.shape
    d = h // heads
    qkv = (jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
           + bqkv[None, None, :]).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to4 = lambda t: t.reshape(b, l, heads, d).transpose(0, 2, 1, 3)  # noqa: E731
    blk = min(512, max(128, l))
    if seg_mode:
        ctx = flash_attention(to4(q), to4(k), to4(v), mask, blk, blk)
    else:
        ctx = flash_attention_padded(to4(q), to4(k), to4(v), mask, blk, blk)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, h)
    out = jnp.dot(ctx, wo, preferred_element_type=jnp.float32) + bo[None, None, :]
    if drop1 is not None:
        out = out * drop1.astype(jnp.float32)
    y = _ln_f32(x.astype(jnp.float32) + out, gamma, beta, eps)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# fused BACKWARD megakernel: one program per row recomputes the forward in
# VMEM and emits dx + all weight grads (VMEM-resident accumulators across the
# sequential grid). Gradient semantics follow the flash-backward convention:
# probabilities are zeroed where masked (a fully-masked query row contributes
# nothing), matching the jax.vjp-of-flash-recompute definition this replaces.
# ---------------------------------------------------------------------------


def _attn_bwd_body(x, dy, wqkv, bqkv, wo, bo, gamma, allowed, q_valid, *,
                   heads, eps, drop1=None):
    """Per-row backward math. x: [L, H]; dy: [L, H] cotangent; returns
    (dx [L, H] f32, dwqkv [H, 3H] f32, dbqkv [1, 3H], dwo [H, H],
    dbo/dgamma/dbeta [1, H]). Two passes over heads bound the live [L, L]
    tiles to one head's worth: pass 1 recomputes ctx exactly as the forward,
    pass 2 recomputes p per head and forms the attention grads. ``drop1``
    is the same inverted-dropout multiplier the forward applied (regenerated
    from the saved PRNG key)."""
    l, h = x.shape
    d = h // heads
    scale = 1.0 / math.sqrt(d)
    cdot = functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32)
    tdot = lambda a, b: cdot(a, b, (((0,), (0,)), ((), ())))  # aᵀ @ b  # noqa: E731
    ndot = lambda a, b: cdot(a, b, (((1,), (1,)), ((), ())))  # a @ bᵀ  # noqa: E731

    def head_probs(qkv, hd):
        q = qkv[:, hd * d:(hd + 1) * d]
        k = qkv[:, h + hd * d: h + (hd + 1) * d]
        v = qkv[:, 2 * h + hd * d: 2 * h + (hd + 1) * d]
        s = ndot(q, k) * scale
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        pn = e / jnp.sum(e, axis=-1, keepdims=True)
        return q, k, v, pn

    xf = x.astype(jnp.float32)
    qkv_f = jnp.dot(x, wqkv, preferred_element_type=jnp.float32) + bqkv[None, :]
    qkv = qkv_f.astype(x.dtype)
    # pass 1: recompute ctx with the forward's exact semantics
    ctx_parts = []
    for hd in range(heads):
        _, _, v, pn = head_probs(qkv, hd)
        ctx_parts.append(cdot(pn.astype(x.dtype), v, (((1,), (0,)), ((), ()))))
    ctx = jnp.concatenate(ctx_parts, axis=-1)  # [L, H] f32
    if q_valid is not None:
        ctx = jnp.where(q_valid, ctx, 0.0)
    out = jnp.dot(ctx.astype(x.dtype), wo,
                  preferred_element_type=jnp.float32) + bo[None, :]
    drop1f = None if drop1 is None else drop1.astype(jnp.float32)
    if drop1f is not None:
        out = out * drop1f
    res = xf + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (res - mu) * inv
    # LayerNorm backward (applies at every row — pad rows receive bias/LN
    # grads exactly as in the unfused graph)
    dyf = dy.astype(jnp.float32)
    dgamma = jnp.sum(dyf * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dyf, axis=0, keepdims=True)
    dxhat = dyf * gamma[None, :]
    dres = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                  - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    # dres flows unchanged into the x-residual; through the dropout site it
    # picks up the multiplier
    dout = dres if drop1f is None else dres * drop1f
    dbo = jnp.sum(dout, axis=0, keepdims=True)
    dout_b = dout.astype(x.dtype)
    dwo = tdot(ctx.astype(x.dtype), dout_b)             # [H, H]
    dctx = ndot(dout_b, wo)                             # dout @ woᵀ, [L, H]
    if q_valid is not None:
        dctx = jnp.where(q_valid, dctx, 0.0)
    # pass 2: per-head attention grads off recomputed probs
    dq_parts, dk_parts, dv_parts = [], [], []
    for hd in range(heads):
        q, k, v, pn = head_probs(qkv, hd)
        pn = jnp.where(allowed, pn, 0.0)  # flash-bwd convention
        dctx_h = dctx[:, hd * d:(hd + 1) * d].astype(x.dtype)
        dpn = ndot(dctx_h, v)                           # [L, L]
        dv_parts.append(tdot(pn.astype(x.dtype), dctx_h))
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True)) * scale
        ds_b = ds.astype(x.dtype)
        dq_parts.append(jnp.dot(ds_b, k, preferred_element_type=jnp.float32))
        dk_parts.append(tdot(ds_b, q))
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)  # [L, 3H]
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dqkv_b = dqkv.astype(x.dtype)
    dwqkv = tdot(x, dqkv_b)                             # [H, 3H]
    dx = dres + ndot(dqkv_b, wqkv)                      # + dqkv @ wqkvᵀ
    return dx, dwqkv, dbqkv, dwo, dbo, dgamma, dbeta


def _bwd_write(refs, vals):
    dx_ref, *acc_refs = refs
    dx, *accs = vals

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in acc_refs:
            r[:] = jnp.zeros_like(r)

    dx_ref[:] = dx.astype(dx_ref.dtype)
    for r, v in zip(acc_refs, accs):
        r[:] += v


def _bwd_padded_kernel(lens_ref, x_ref, dy_ref, wqkv_ref, bqkv_ref, wo_ref,
                       bo_ref, gamma_ref, *rest, heads, eps, dropped):
    drop_refs, out_refs = (rest[:1], rest[1:]) if dropped else ((), rest)
    x = x_ref[:]
    l = x.shape[0]
    length = lens_ref[pl.program_id(0)]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    vals = _attn_bwd_body(
        x, dy_ref[:], wqkv_ref[:], bqkv_ref[0], wo_ref[:], bo_ref[0],
        gamma_ref[0], kpos < length, qpos < length, heads=heads, eps=eps,
        drop1=drop_refs[0][:] if drop_refs else None)
    _bwd_write(out_refs, vals)


def _bwd_segment_kernel(seg_ref, x_ref, dy_ref, wqkv_ref, bqkv_ref, wo_ref,
                        bo_ref, gamma_ref, *rest, heads, eps, dropped):
    drop_refs, out_refs = (rest[:1], rest[1:]) if dropped else ((), rest)
    x = x_ref[:]
    seg = seg_ref[0, :]
    allowed = (seg[None, :] == seg[:, None]) & (seg[None, :] > 0)
    vals = _attn_bwd_body(
        x, dy_ref[:], wqkv_ref[:], bqkv_ref[0], wo_ref[:], bo_ref[0],
        gamma_ref[0], allowed, None, heads=heads, eps=eps,
        drop1=drop_refs[0][:] if drop_refs else None)
    _bwd_write(out_refs, vals)


def _pallas_fused_bwd(x, dy, wqkv, bqkv, wo, bo, gamma, mask, heads, eps,
                      seg_mode, drops=()):
    b, l, h = x.shape
    orig_l = l
    l_pad = -(-l // 128) * 128
    if l_pad != l:
        # dy is zero-padded, so padded rows contribute nothing to any grad
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, l_pad - l), (0, 0)))
        drops = tuple(jnp.pad(d, ((0, 0), (0, l_pad - l), (0, 0)))
                      for d in drops)
        if seg_mode:
            mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)))
        l = l_pad
    args = (x, dy, wqkv, _f32row(bqkv), wo, _f32row(bo), _f32row(gamma),
            *drops)
    row_spec = pl.BlockSpec((None, l, h), lambda i, *a: (i, 0, 0))
    weight_specs = [
        row_spec,                                              # x
        row_spec,                                              # dy
        pl.BlockSpec((h, 3 * h), lambda *a: (0, 0)),
        pl.BlockSpec((1, 3 * h), lambda *a: (0, 0)),
        pl.BlockSpec((h, h), lambda *a: (0, 0)),
        pl.BlockSpec((1, h), lambda *a: (0, 0)),
        pl.BlockSpec((1, h), lambda *a: (0, 0)),
        *([row_spec] * len(drops)),
    ]
    acc = lambda *shape: pl.BlockSpec(shape, lambda *a: (0,) * len(shape))  # noqa: E731
    out_specs = [
        row_spec,                                              # dx
        acc(h, 3 * h), acc(1, 3 * h), acc(h, h), acc(1, h), acc(1, h),
        acc(1, h),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, l, h), x.dtype),
        jax.ShapeDtypeStruct((h, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
    ]
    common = dict(
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    kern_kw = dict(heads=heads, eps=eps, dropped=bool(drops))
    if seg_mode:
        outs = pl.pallas_call(
            functools.partial(_bwd_segment_kernel, **kern_kw),
            grid=(b,),
            in_specs=[pl.BlockSpec((None, 1, l), lambda i: (i, 0, 0)),
                      *weight_specs],
            out_specs=out_specs,
            **common,
        )(mask.astype(jnp.int32).reshape(b, 1, l), *args)
    else:
        outs = pl.pallas_call(
            functools.partial(_bwd_padded_kernel, **kern_kw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=weight_specs,
                out_specs=out_specs,
            ),
            **common,
        )(jnp.clip(mask.astype(jnp.int32), 0, orig_l), *args)
    dx, dwqkv, dbqkv, dwo, dbo, dgamma, dbeta = outs
    return (dx[:, :orig_l, :], dwqkv, dbqkv[0], dwo, dbo[0], dgamma[0],
            dbeta[0])


def _vmem_estimate_bwd(h: int, l: int) -> int:
    """Resident-VMEM estimate for one bwd program: IO blocks (x/dy/dx,
    double-buffered bf16), bf16 weights, f32 grad accumulators (live across
    the whole grid), the f32+bf16 qkv value, f32 ctx/dres/dctx/dqkv rows and
    one head's transient [L, L] f32 score/prob/dp tiles."""
    io = 3 * 2 * 2 * l * h
    weights = 2 * (3 * h * h) + 2 * h * h
    accum = 4 * (3 * h * h) + 4 * h * h
    qkv = 18 * l * h
    mats = 4 * l * h * 4 + 6 * l * 3 * h
    scores = 16 * l * l
    return io + weights + accum + qkv + mats + scores


def fused_bwd_supported(hidden_size: int, heads: int, seq_len: int) -> bool:
    """VMEM gate for the backward megakernel; unsupported shapes fall back
    to jax.vjp through the flash recompute graph."""
    return (fused_supported(hidden_size, heads, seq_len)
            and _vmem_estimate_bwd(hidden_size, -(-seq_len // 128) * 128)
            <= _VMEM_BUDGET)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fused(x, wqkv, bqkv, wo, bo, gamma, beta, mask, rng, heads, eps,
           seg_mode, rate):
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 1)
    return _pallas_fused(x, wqkv, bqkv, wo, bo, gamma, beta, mask, heads,
                         eps, seg_mode, drops)


def _fused_fwd(x, wqkv, bqkv, wo, bo, gamma, beta, mask, rng, heads, eps,
               seg_mode, rate):
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 1)
    y = _pallas_fused(x, wqkv, bqkv, wo, bo, gamma, beta, mask, heads, eps,
                      seg_mode, drops)
    # only the KEY is saved — the backward regenerates the identical mask
    return y, (x, wqkv, bqkv, wo, bo, gamma, beta, mask, rng)


def _fused_bwd(heads, eps, seg_mode, rate, res, g):
    x, wqkv, bqkv, wo, bo, gamma, beta, mask, rng = res
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 1)
    if fused_bwd_supported(x.shape[-1], heads, x.shape[1]):
        dx, dwqkv, dbqkv, dwo, dbo, dgamma, dbeta = _pallas_fused_bwd(
            x, g, wqkv, bqkv, wo, bo, gamma, mask, heads, eps, seg_mode,
            drops)
        return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                dbo.astype(bo.dtype), dgamma.astype(gamma.dtype),
                dbeta.astype(beta.dtype), None, None)
    drop1 = drops[0] if drops else None
    _, vjp = jax.vjp(
        lambda *a: _unfused_reference(*a, mask, heads, eps, seg_mode, drop1),
        x, wqkv, bqkv, wo, bo, gamma, beta,
    )
    return (*vjp(g.astype(x.dtype)), None, None)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_ln(
    x, wqkv, bqkv, wo, bo, gamma, beta, *,
    lengths=None, segment_ids=None, heads: int, eps: float = 1e-12,
    dropout_rate: float = 0.0, dropout_rng=None,
):
    """y = LayerNorm(x + dropout(multi_head_attention(x) @ Wo + bo)) in one
    fused Pallas program per batch row.

    x: [B, L, H]; wqkv: [H, 3H] (q|k|v column blocks); bqkv: [3H];
    wo: [H, H]; bo/gamma/beta: [H]. Exactly one of ``lengths`` [B] /
    ``segment_ids`` [B, L] selects the mask flavor. LN statistics are f32
    (the standard TPU recipe); biases/LN params are taken in f32.

    ``dropout_rate``/``dropout_rng``: hidden dropout at the attention output
    (the nn.Dropout site of the unfused layer). The inverted-dropout
    multiplier is derived from the key in XLA and passed to the kernel as an
    operand; the backward regenerates it from the saved key, so no mask is
    stored. Attention-PROBS dropout is not supported (the [L, L] masks would
    not fit as operands) — callers keep that at 0, the flash-attn training
    convention.

    Constraints (callers should fall back to the flash path otherwise):
    H % 128 == 0, head_dim % 8 == 0, L <= ~1024 (the [L, L] f32 score tile
    lives in VMEM).
    """
    if (lengths is None) == (segment_ids is None):
        raise ValueError("pass exactly one of lengths= / segment_ids=")
    if dropout_rate and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    seg_mode = segment_ids is not None
    mask = segment_ids if seg_mode else lengths
    return _fused(x, wqkv, bqkv, wo, bo, gamma, beta, mask,
                  dropout_rng if dropout_rate else None, heads, eps,
                  seg_mode, float(dropout_rate))


def _vmem_estimate(h: int, l: int, ff: int = 0) -> int:
    """Conservative resident-VMEM byte estimate for one fused program:
    double-buffered x/y blocks, bf16 weights, the f32+bf16 qkv value, live
    [L, L] f32 score/prob tiles, f32 ctx, and (full-layer) the FFN weights
    + f32/bf16 intermediate. Mosaic's allocator is not exactly predictable;
    the budget below is calibrated so the measured-good configs (BERT-base/
    large, L<=1024, under vmem_limit_bytes=110MB) pass and genuinely
    oversized ones (e.g. H=2048/FF=8192/L=1024) fall back to flash instead
    of dying with a compile error."""
    io = 4 * 2 * l * h                      # x + y, double-buffered, bf16
    weights = 2 * (h * 3 * h) + 2 * h * h   # wqkv + wo, bf16
    qkv = 18 * l * h                        # f32 accum + bf16 value
    scores = 12 * l * l                     # s + p tiles, f32
    ctx = 4 * l * h
    if ff:
        weights += 2 * 2 * h * ff           # wup + wdown, bf16
        qkv += 6 * l * ff                   # f32 up + bf16 act
    return io + weights + qkv + scores + ctx


_VMEM_BUDGET = 88 * 1024 * 1024


def fused_supported(hidden_size: int, heads: int, seq_len: int) -> bool:
    """Shape + VMEM gate for the fused kernel (see `fused_attention_ln`)."""
    d = hidden_size // heads
    return (hidden_size % 128 == 0 and d % 8 == 0 and seq_len <= 1024
            and _vmem_estimate(hidden_size, -(-seq_len // 128) * 128)
            <= _VMEM_BUDGET)


# ---------------------------------------------------------------------------
# full-layer variant: attention block + FFN + both LayerNorms in one program
# (another ~4% over attn-only + XLA FFN: 155-161 TF/s measured on v5e —
#  81% MFU at [256, 128]; the FFN weights add ~9.5 MB of resident VMEM)
# ---------------------------------------------------------------------------


def _full_padded_kernel(lens_ref, x_ref, *rest, heads, eps, act, dropped):
    if dropped:
        *w_refs, d1_ref, d2_ref, y_ref = rest
        d1, d2 = d1_ref[:], d2_ref[:]
    else:
        *w_refs, y_ref = rest
        d1 = d2 = None
    x = x_ref[:]
    l = x.shape[0]
    length = lens_ref[pl.program_id(0)]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    w = tuple(r[:] if r.shape[0] > 1 else r[0] for r in w_refs)
    y_ref[:] = _layer_core(x, w, kpos < length, heads=heads, eps=eps, act=act,
                           out_dtype=y_ref.dtype, q_valid=qpos < length,
                           drop1=d1, drop2=d2)


def _full_segment_kernel(seg_ref, x_ref, *rest, heads, eps, act, dropped):
    if dropped:
        *w_refs, d1_ref, d2_ref, y_ref = rest
        d1, d2 = d1_ref[:], d2_ref[:]
    else:
        *w_refs, y_ref = rest
        d1 = d2 = None
    x = x_ref[:]
    seg = seg_ref[0, :]
    allowed = (seg[None, :] == seg[:, None]) & (seg[None, :] > 0)
    w = tuple(r[:] if r.shape[0] > 1 else r[0] for r in w_refs)
    y_ref[:] = _layer_core(x, w, allowed, heads=heads, eps=eps, act=act,
                           out_dtype=y_ref.dtype, drop1=d1, drop2=d2)


def _pallas_fused_layer(x, weights, mask, heads, eps, act, seg_mode,
                        drops=()):
    b, l, h = x.shape
    l_pad = -(-l // 128) * 128
    orig_l = l
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        drops = tuple(jnp.pad(d, ((0, 0), (0, l_pad - l), (0, 0)))
                      for d in drops)
        if seg_mode:
            mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)))
        l = l_pad
    wqkv, bqkv, wo, bo, g1, b1, wup, bup, wdown, bdown, g2, b2 = weights
    w_args = (wqkv, _f32row(bqkv), wo, _f32row(bo), _f32row(g1), _f32row(b1),
              wup, _f32row(bup), wdown, _f32row(bdown), _f32row(g2), _f32row(b2))
    row_spec = pl.BlockSpec((None, l, h), lambda i, *a: (i, 0, 0))
    w_specs = [pl.BlockSpec(a.shape, lambda *i: (0, 0)) for a in w_args]
    w_specs += [row_spec] * len(drops)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    kern_kw = dict(heads=heads, eps=eps, act=act, dropped=bool(drops))
    if seg_mode:
        out = pl.pallas_call(
            functools.partial(_full_segment_kernel, **kern_kw),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((None, 1, l), lambda i: (i, 0, 0)),
                row_spec,
                *w_specs,
            ],
            out_specs=row_spec,
            **common,
        )(mask.astype(jnp.int32).reshape(b, 1, l), x, *w_args, *drops)
    else:
        out = pl.pallas_call(
            functools.partial(_full_padded_kernel, **kern_kw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=[row_spec, *w_specs],
                out_specs=row_spec,
            ),
            **common,
        )(jnp.clip(mask.astype(jnp.int32), 0, orig_l), x, *w_args, *drops)
    return out[:, :orig_l, :]


def _unfused_layer_reference(x, weights, mask, heads, eps, act, seg_mode,
                             drops=()):
    """Flash-attention recompute graph for the full layer (fallback backward
    path + test oracle)."""
    wqkv, bqkv, wo, bo, g1, b1, wup, bup, wdown, bdown, g2, b2 = weights
    d1, d2 = drops if drops else (None, None)
    h1 = _unfused_reference(x, wqkv, bqkv, wo, bo, g1, b1, mask, heads, eps,
                            seg_mode, d1)
    up = jnp.dot(h1, wup, preferred_element_type=jnp.float32)
    up = _ACTS[act](up + bup[None, None, :]).astype(x.dtype)
    dn = jnp.dot(up, wdown, preferred_element_type=jnp.float32) + bdown[None, None, :]
    if d2 is not None:
        dn = dn * d2.astype(jnp.float32)
    y = _ln_f32(h1.astype(jnp.float32) + dn, g2, b2, eps)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 8))
def _fused_layer(x, weights, heads, eps, act, seg_mode, mask, rng, rate):
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 2)
    return _pallas_fused_layer(x, weights, mask, heads, eps, act, seg_mode,
                               drops)


def _fused_layer_fwd(x, weights, heads, eps, act, seg_mode, mask, rng, rate):
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 2)
    y = _pallas_fused_layer(x, weights, mask, heads, eps, act, seg_mode,
                            drops)
    return y, (x, weights, mask, rng)


def _fused_layer_bwd(heads, eps, act, seg_mode, rate, res, g):
    x, weights, mask, rng = res
    wqkv, bqkv, wo, bo, g1, b1, wup, bup, wdown, bdown, g2, b2 = weights
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 2)
    d1, d2 = drops if drops else (None, None)
    if fused_bwd_supported(x.shape[-1], heads, x.shape[1]):
        # composite backward: recompute h1 with the fused FORWARD kernel,
        # differentiate the FFN half under jax.vjp (clean batched GEMMs XLA
        # runs near peak), then run the attention-block BACKWARD megakernel.
        # Recompute-then-differentiate happens inside this rule, so the FFN
        # intermediates live only for one layer's backward (remat-grade).
        h1 = _pallas_fused(x, wqkv, bqkv, wo, bo, g1, b1, mask, heads, eps,
                           seg_mode, drops[:1])

        def ffn_half(h1_, wup_, bup_, wdown_, bdown_, g2_, b2_):
            up = jnp.dot(h1_, wup_, preferred_element_type=jnp.float32)
            up = _ACTS[act](up + bup_[None, None, :]).astype(h1_.dtype)
            dn = jnp.dot(up, wdown_,
                         preferred_element_type=jnp.float32) + bdown_[None, None, :]
            if d2 is not None:
                dn = dn * d2.astype(jnp.float32)
            y = _ln_f32(h1_.astype(jnp.float32) + dn, g2_, b2_, eps)
            return y.astype(h1_.dtype)

        _, vjp = jax.vjp(ffn_half, h1, wup, bup, wdown, bdown, g2, b2)
        dh1, dwup, dbup, dwdown, dbdown, dg2, db2 = vjp(g.astype(h1.dtype))
        dx, dwqkv, dbqkv, dwo, dbo, dg1, db1 = _pallas_fused_bwd(
            x, dh1, wqkv, bqkv, wo, bo, g1, mask, heads, eps, seg_mode,
            drops[:1])
        cast = lambda t, p: t.astype(p.dtype)  # noqa: E731
        return (cast(dx, x),
                (cast(dwqkv, wqkv), cast(dbqkv, bqkv), cast(dwo, wo),
                 cast(dbo, bo), cast(dg1, g1), cast(db1, b1), dwup, dbup,
                 dwdown, dbdown, dg2, db2), None, None)
    _, vjp = jax.vjp(
        lambda x_, w_: _unfused_layer_reference(x_, w_, mask, heads, eps, act,
                                                seg_mode, drops),
        x, weights,
    )
    return (*vjp(g.astype(x.dtype)), None, None)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_encoder_layer(
    x, weights, *, lengths=None, segment_ids=None, heads: int,
    eps: float = 1e-12, act: str = "gelu",
    dropout_rate: float = 0.0, dropout_rng=None,
):
    """One full post-norm encoder layer (BERT shape) in a single Pallas
    program per batch row:

        h1 = LN1(x + dropout(attn(x) @ Wo + bo))
        y  = LN2(h1 + dropout(act(h1 @ Wup + bup) @ Wdown + bdown))

    ``weights`` = (wqkv, bqkv, wo, bo, gamma1, beta1, wup, bup, wdown,
    bdown, gamma2, beta2). Same mask flavors, dtype rules, custom-vjp
    backward (fused bwd megakernel + XLA FFN vjp), dropout mechanism
    (key-derived multipliers, regenerated in the backward) and shape gates
    as `fused_attention_ln`, plus intermediate_size % 128 == 0 and act in
    {'gelu', 'gelu_new', 'relu'}.
    """
    if (lengths is None) == (segment_ids is None):
        raise ValueError("pass exactly one of lengths= / segment_ids=")
    if dropout_rate and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    seg_mode = segment_ids is not None
    mask = segment_ids if seg_mode else lengths
    return _fused_layer(x, tuple(weights), heads, eps, act, seg_mode, mask,
                        dropout_rng if dropout_rate else None,
                        float(dropout_rate))


def fused_layer_supported(hidden_size: int, heads: int, seq_len: int,
                          intermediate_size: int, act: str) -> bool:
    return (fused_supported(hidden_size, heads, seq_len)
            and intermediate_size % 128 == 0 and act in _ACTS
            and _vmem_estimate(hidden_size, -(-seq_len // 128) * 128,
                               intermediate_size) <= _VMEM_BUDGET)


# ---------------------------------------------------------------------------
# int8 W8A8 full-layer variant (inference only): the projection/FFN GEMMs run
# int8 x int8 -> int32 on the MXU — 394 TOPS on v5e, 2x its bf16 peak — while
# attention softmax/LNs stay in f32 exactly as the bf16 kernel. Weights arrive
# pre-quantized per output channel (models/quantize.py layout: int8 kernel +
# f32 scale); activations quantize per token INSIDE the kernel (one abs-max +
# rescale per GEMM input — VPU work on a VMEM-resident value). Same math as
# the unfused QuantDense path (models/quantize.py::QuantDense), so the
# quality contract carries over: embedding cosine vs fp > 0.999.
# No custom vjp: quantized mode is serving-only (quantize.py raises on LoRA
# and the engines only quantize at load).
# ---------------------------------------------------------------------------


def _qdot(x, wq, s_w, b):
    """Per-token dynamic int8 GEMM: quantize x rows symmetric-int8, multiply
    against the int8 per-output-channel kernel on the MXU with int32
    accumulation, dequantize. Mirrors QuantDense bit for bit (same clip /
    round / scale recipe). x: [L, K] (any float dtype); wq: [K, N] int8;
    s_w: [N] f32; b: [N] f32. Returns [L, N] f32."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_a = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * s_a * s_w[None, :] + b[None, :]


def _layer_core_int8(x, w, allowed, *, heads, eps, act, out_dtype,
                     q_valid=None):
    """int8 analog of `_layer_core`. w = (wqkv_q, s_qkv, bqkv, wo_q, s_o, bo,
    g1, b1, wup_q, s_up, bup, wdn_q, s_dn, bdn, g2, b2)."""
    (wqkv_q, s_qkv, bqkv, wo_q, s_o, bo, g1, b1,
     wup_q, s_up, bup, wdn_q, s_dn, bdn, g2, b2) = w
    l, h = x.shape
    d = h // heads
    scale = 1.0 / math.sqrt(d)
    qkv = _qdot(x, wqkv_q, s_qkv, bqkv).astype(x.dtype)  # [L, 3H]
    ctx_parts = []
    for hd in range(heads):
        q = qkv[:, hd * d:(hd + 1) * d]
        k = qkv[:, h + hd * d: h + (hd + 1) * d]
        v = qkv[:, 2 * h + hd * d: 2 * h + (hd + 1) * d]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_parts, axis=-1)  # [L, H] f32
    if q_valid is not None:
        ctx = jnp.where(q_valid, ctx, 0.0)
    out = _qdot(ctx.astype(x.dtype), wo_q, s_o, bo)
    h1 = _ln_f32(x.astype(jnp.float32) + out, g1, b1, eps).astype(x.dtype)
    up = _qdot(h1, wup_q, s_up, bup)
    up = _ACTS[act](up).astype(x.dtype)
    dn = _qdot(up, wdn_q, s_dn, bdn)
    y = _ln_f32(h1.astype(jnp.float32) + dn, g2, b2, eps)
    return y.astype(out_dtype)


def _int8_padded_kernel(lens_ref, x_ref, *rest, heads, eps, act):
    *w_refs, y_ref = rest
    x = x_ref[:]
    l = x.shape[0]
    length = lens_ref[pl.program_id(0)]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    w = tuple(r[:] if r.shape[0] > 1 else r[0] for r in w_refs)
    y_ref[:] = _layer_core_int8(x, w, kpos < length, heads=heads, eps=eps,
                                act=act, out_dtype=y_ref.dtype,
                                q_valid=qpos < length)


def _int8_segment_kernel(seg_ref, x_ref, *rest, heads, eps, act):
    *w_refs, y_ref = rest
    x = x_ref[:]
    seg = seg_ref[0, :]
    allowed = (seg[None, :] == seg[:, None]) & (seg[None, :] > 0)
    w = tuple(r[:] if r.shape[0] > 1 else r[0] for r in w_refs)
    y_ref[:] = _layer_core_int8(x, w, allowed, heads=heads, eps=eps, act=act,
                                out_dtype=y_ref.dtype)


def fused_encoder_layer_int8(
    x, weights, *, lengths=None, segment_ids=None, heads: int,
    eps: float = 1e-12, act: str = "gelu",
):
    """One full post-norm encoder layer with int8 W8A8 projection/FFN GEMMs
    in a single Pallas program per batch row (inference only — serving path
    of `BertConfig(quantized=True, attention_impl='fused')`).

    ``weights`` = (wqkv_q [H, 3H] int8, s_qkv [3H] f32, bqkv [3H] f32,
    wo_q [H, H] int8, s_o [H], bo [H], gamma1, beta1,
    wup_q [H, FF] int8, s_up [FF], bup [FF],
    wdn_q [FF, H] int8, s_dn [H], bdn [H], gamma2, beta2).
    Mask flavors and shape gates match `fused_encoder_layer`.
    """
    if (lengths is None) == (segment_ids is None):
        raise ValueError("pass exactly one of lengths= / segment_ids=")
    seg_mode = segment_ids is not None
    mask = segment_ids if seg_mode else lengths
    b, l, h = x.shape
    orig_l = l
    l_pad = -(-l // 128) * 128
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        if seg_mode:
            mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)))
        l = l_pad
    (wqkv_q, s_qkv, bqkv, wo_q, s_o, bo, g1, b1,
     wup_q, s_up, bup, wdn_q, s_dn, bdn, g2, b2) = weights
    w_args = (wqkv_q, _f32row(s_qkv), _f32row(bqkv), wo_q, _f32row(s_o),
              _f32row(bo), _f32row(g1), _f32row(b1), wup_q, _f32row(s_up),
              _f32row(bup), wdn_q, _f32row(s_dn), _f32row(bdn), _f32row(g2),
              _f32row(b2))
    row_spec = pl.BlockSpec((None, l, h), lambda i, *a: (i, 0, 0))
    w_specs = [pl.BlockSpec(a.shape, lambda *i: (0, 0)) for a in w_args]
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    kern_kw = dict(heads=heads, eps=eps, act=act)
    if seg_mode:
        out = pl.pallas_call(
            functools.partial(_int8_segment_kernel, **kern_kw),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((None, 1, l), lambda i: (i, 0, 0)),
                row_spec,
                *w_specs,
            ],
            out_specs=row_spec,
            **common,
        )(mask.astype(jnp.int32).reshape(b, 1, l), x, *w_args)
    else:
        out = pl.pallas_call(
            functools.partial(_int8_padded_kernel, **kern_kw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=[row_spec, *w_specs],
                out_specs=row_spec,
            ),
            **common,
        )(jnp.clip(mask.astype(jnp.int32), 0, orig_l), x, *w_args)
    return out[:, :orig_l, :]


def _vmem_estimate_int8(h: int, l: int, ff: int) -> int:
    """Resident-VMEM estimate for one int8 program: bf16 x/y IO
    (double-buffered), int8 weights (half the bf16 footprint), f32 scale/
    bias/LN rows, the i32 qkv accumulator + f32 dequant + bf16 value, one
    head's [L, L] f32 score/prob tiles, f32 ctx/h1, and the FFN i32/f32/bf16
    intermediates."""
    io = 4 * 2 * l * h
    weights = 3 * h * h + h * h + 2 * h * ff          # int8
    rows = 4 * (2 * 3 * h + 4 * h + 2 * ff + 2 * h)   # f32 scales/biases/LN
    qkv = (4 + 4 + 2) * l * 3 * h + l * h             # i32 + f32 + bf16 + xq
    scores = 12 * l * l
    ctx = 2 * 4 * l * h
    ffn = (4 + 4 + 2) * l * ff
    return io + weights + rows + qkv + scores + ctx + ffn


def fused_layer_int8_supported(hidden_size: int, heads: int, seq_len: int,
                               intermediate_size: int, act: str) -> bool:
    """Shape + VMEM gate for the int8 full-layer kernel."""
    d = hidden_size // heads
    return (hidden_size % 128 == 0 and d % 8 == 0 and seq_len <= 1024
            and intermediate_size % 128 == 0 and act in _ACTS
            and _vmem_estimate_int8(hidden_size, -(-seq_len // 128) * 128,
                                    intermediate_size) <= _VMEM_BUDGET)
