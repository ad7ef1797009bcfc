"""Fused decoder attention block — the pre-norm megakernel for Llama/Qwen
trunks (the LLM-embedder / LLM-reranker encode path).

ONE Pallas program per batch row computes the whole attention sub-block:

    y = x + O(attention(RoPE(qk_norm(QKV(RMSNorm(x))))))

i.e. the input RMSNorm, fused QKV projection (+bias for Qwen2), optional
per-head q/k RMSNorm (Qwen3), rotary embedding, all query heads' causal
softmax attention with GQA key/value sharing, the output projection and the
residual add — every intermediate living in VMEM. The SwiGLU MLP stays in
XLA: its weights alone exceed the VMEM budget at real model widths, and it
is a pure GEMM chain XLA already runs at full tilt.

Why this exists: the unfused decoder path pays four HBM transposes around
the flash kernel, materializes the GQA-repeated K/V ([B, L, nq, d] instead
of [B, L, nkv, d]) in HBM, and leaves RoPE/RMSNorm as separate fusions.
Owning the block removes all three (GQA sharing happens by slicing the
VMEM-resident qkv value — no repeat is ever materialized). Same design as
ops/fused_encoder.py; see there for why per-head VMEM lane slices work
where a layout-native [B, L, H, D] flash kernel does not.

Masking contract: rows are RIGHT-padded with per-row valid ``lengths``
(the repo-wide convention — tokenizer right padding; sessions enforce it).
Queries attend causally within the valid prefix; the attention context at
pad query rows is zeroed, so pad rows return x unchanged (modulo the
output-projection bias, absent in these models). The custom-vjp backward
recomputes the UNFUSED graph (flash-attention kernels, O(L·D) memory) and
backprops through it — `_unfused_reference` matches the kernel on every
row including pads, keeping the gradient exact for any cotangent.

Reference role parity: the attention compute of the causal LMs the
reference fine-tunes as LLM embedders/rerankers
(Nexus/training/embedder/text_retrieval/decoder_only/load_model.py:13-121,
Nexus/training/reranker/text_retrieval/modeling.py:53).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def iota_rope_tables(l: int, d: int, theta: float):
    """Full-head-dim cos/sin tables [1, L, d] for right-padded rows
    (positions = iota), HF layout: the half-frequency table duplicated
    across both halves, applied as ``t*cos + rotate_half(t)*sin``."""
    pos = jnp.arange(l, dtype=jnp.float32)
    freqs = jnp.exp(-math.log(theta)
                    * jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    ang = pos[:, None] * freqs[None, :]  # [L, d/2]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    return cos[None], sin[None]


def _rope2(t, cos, sin):
    """Rotate a [L, d] head block: t*cos + rotate_half(t)*sin with full-dim
    [L, d] tables (identical to the half-split convention when the tables
    duplicate the frequency halves — iota_rope_tables does)."""
    d = t.shape[-1]
    tf = t.astype(jnp.float32)
    rot = jnp.concatenate([-tf[:, d // 2:], tf[:, : d // 2]], axis=-1)
    return (tf * cos + rot * sin).astype(t.dtype)


def _head_rms(t, w, eps):
    """Per-head RMSNorm over head_dim (Qwen3 qk_norm), f32 stats."""
    tf = t.astype(jnp.float32)
    var = jnp.mean(tf * tf, axis=-1, keepdims=True)
    return (tf * jax.lax.rsqrt(var + eps) * w[None, :]).astype(t.dtype)


def _dec_kernel(lens_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, rms_ref,
                qn_ref, kn_ref, cos_ref, sin_ref, y_ref, *, nq, nkv, d, eps,
                qk_norm):
    x = x_ref[:]
    l, h = x.shape
    length = lens_ref[pl.program_id(0)]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    allowed = (kpos <= qpos) & (kpos < length)
    q_valid = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) < length
    y_ref[:] = _dec_core(
        x, wqkv_ref[:], bqkv_ref[0], wo_ref[:], rms_ref[0], qn_ref[0],
        kn_ref[0], cos_ref[:], sin_ref[:], allowed, q_valid,
        nq=nq, nkv=nkv, d=d, eps=eps, qk_norm=qk_norm,
    ).astype(y_ref.dtype)


def _dec_seg_kernel(seg_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, rms_ref,
                    qn_ref, kn_ref, cos_ref, sin_ref, y_ref, *, nq, nkv, d,
                    eps, qk_norm):
    """Packed-rows flavor: causal attention within each segment (0 = pad)."""
    x = x_ref[:]
    l, _ = x.shape
    seg = seg_ref[0, :]  # [L]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    allowed = (kpos <= qpos) & (seg[None, :] == seg[:, None]) & (seg[None, :] > 0)
    # reshape the i32 BEFORE comparing: Mosaic can't insert a minor dim on
    # an i1 vector ("only supported for 32-bit types" — hit on real TPU)
    q_valid = seg[:, None] > 0
    y_ref[:] = _dec_core(
        x, wqkv_ref[:], bqkv_ref[0], wo_ref[:], rms_ref[0], qn_ref[0],
        kn_ref[0], cos_ref[:], sin_ref[:], allowed, q_valid,
        nq=nq, nkv=nkv, d=d, eps=eps, qk_norm=qk_norm,
    ).astype(y_ref.dtype)


def _dec_core(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, allowed,
              q_valid, *, nq, nkv, d, eps, qk_norm):
    """Shared kernel body: RMSNorm + QKV + (qk-norm) + RoPE + masked
    attention + O + residual on a VMEM-resident [L, H] row."""
    scale = 1.0 / math.sqrt(d)
    # input RMSNorm (f32 stats); the residual adds RAW x
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = (xf * jax.lax.rsqrt(var + eps) * rms_w[None, :]).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[None, :]).astype(x.dtype)  # [L, (nq+2nkv)d]
    group = nq // nkv
    ctx_parts = []
    for hd in range(nq):
        q = qkv[:, hd * d:(hd + 1) * d]
        kv = hd // group  # GQA: shared K/V head, sliced — never repeated
        k = qkv[:, nq * d + kv * d: nq * d + (kv + 1) * d]
        v = qkv[:, (nq + nkv) * d + kv * d: (nq + nkv) * d + (kv + 1) * d]
        if qk_norm:
            q = _head_rms(q, qn_w, eps)
            k = _head_rms(k, kn_w, eps)
        q = _rope2(q, cos, sin)
        k = _rope2(k, cos, sin)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(jnp.dot(p.astype(x.dtype), v,
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_parts, axis=-1)  # [L, nq*d] f32
    ctx = jnp.where(q_valid, ctx, 0.0)  # pad query rows: y = x exactly
    out = jnp.dot(ctx.astype(x.dtype), wo,
                  preferred_element_type=jnp.float32)
    return xf + out


def _pallas_dec(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask,
                nq, nkv, d, eps, qk_norm, seg_mode):
    """``mask`` is per-row ``lengths`` [B] (padded mode) or ``segment_ids``
    [B, L] (packed mode, seg_mode=True)."""
    b, l, h = x.shape
    # lane-pad L so the [L, L] score tile is legal; padded rows are masked
    # out as pad queries (zero ctx) and sliced off below
    orig_l = l
    l_pad = -(-l // 128) * 128
    if l_pad != l:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
        cos = jnp.pad(cos, ((0, 0), (0, l_pad - l), (0, 0)))
        sin = jnp.pad(sin, ((0, 0), (0, l_pad - l), (0, 0)))
        if seg_mode:
            mask = jnp.pad(mask, ((0, 0), (0, l_pad - l)))
        l = l_pad
    qw = wqkv.shape[-1]
    f32row = lambda t: jnp.asarray(t, jnp.float32).reshape(1, -1)  # noqa: E731
    w_args = (wqkv, f32row(bqkv), wo, f32row(rms_w), f32row(qn_w),
              f32row(kn_w), cos.astype(jnp.float32), sin.astype(jnp.float32))
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, l, h), x.dtype),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    kern_kw = dict(nq=nq, nkv=nkv, d=d, eps=eps, qk_norm=qk_norm)
    if seg_mode:
        # per-row tables (packed positions / M-RoPE) index by program id;
        # shared tables are [1, L, d] and every program reads block 0
        tab_row = (lambda i: (i, 0, 0)) if cos.shape[0] == b \
            else (lambda i: (0, 0, 0))
        w_specs = [
            pl.BlockSpec((h, qw), lambda i: (0, 0)),
            pl.BlockSpec((1, qw), lambda i: (0, 0)),
            pl.BlockSpec((nq * d, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((None, l, d), tab_row),
            pl.BlockSpec((None, l, d), tab_row),
        ]
        out = pl.pallas_call(
            functools.partial(_dec_seg_kernel, **kern_kw),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((None, 1, l), lambda i: (i, 0, 0)),
                pl.BlockSpec((None, l, h), lambda i: (i, 0, 0)),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((None, l, h), lambda i: (i, 0, 0)),
            **common,
        )(mask.astype(jnp.int32).reshape(b, 1, l), x, *w_args)
    else:
        tab_row = (lambda i, lens: (i, 0, 0)) if cos.shape[0] == b \
            else (lambda i, lens: (0, 0, 0))
        w_specs = [
            pl.BlockSpec((h, qw), lambda *a: (0, 0)),
            pl.BlockSpec((1, qw), lambda *a: (0, 0)),
            pl.BlockSpec((nq * d, h), lambda *a: (0, 0)),
            pl.BlockSpec((1, h), lambda *a: (0, 0)),
            pl.BlockSpec((1, d), lambda *a: (0, 0)),
            pl.BlockSpec((1, d), lambda *a: (0, 0)),
            pl.BlockSpec((None, l, d), tab_row),
            pl.BlockSpec((None, l, d), tab_row),
        ]
        lengths = jnp.clip(mask, 0, orig_l)
        out = pl.pallas_call(
            functools.partial(_dec_kernel, **kern_kw),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(b,),
                in_specs=[
                    pl.BlockSpec((None, l, h), lambda i, lens: (i, 0, 0)),
                    *w_specs,
                ],
                out_specs=pl.BlockSpec((None, l, h), lambda i, lens: (i, 0, 0)),
            ),
            **common,
        )(lengths.astype(jnp.int32), x, *w_args)
    return out[:, :orig_l, :]


def _unfused_reference(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin,
                       mask, nq, nkv, d, eps, qk_norm, seg_mode=False):
    """The same math through the blocked flash kernel (O(L·D) memory) — the
    custom-vjp recompute graph and the test oracle. Matches the fused kernel
    on EVERY row including pad queries (ctx zeroed there). ``mask`` is
    lengths [B] or, with seg_mode, segment_ids [B, L]."""
    from nexus_tpu.ops.flash_attention import flash_attention

    b, l, h = x.shape
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = (xf * jax.lax.rsqrt(var + eps) * rms_w[None, None, :]).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)
           + bqkv[None, None, :]).astype(x.dtype)
    q = qkv[..., : nq * d].reshape(b, l, nq, d)
    k = qkv[..., nq * d:(nq + nkv) * d].reshape(b, l, nkv, d)
    v = qkv[..., (nq + nkv) * d:].reshape(b, l, nkv, d)
    if qk_norm:
        qf = q.astype(jnp.float32)
        q = (qf * jax.lax.rsqrt(jnp.mean(qf * qf, -1, keepdims=True) + eps)
             * qn_w).astype(q.dtype)
        kf = k.astype(jnp.float32)
        k = (kf * jax.lax.rsqrt(jnp.mean(kf * kf, -1, keepdims=True) + eps)
             * kn_w).astype(k.dtype)
    c4, s4 = cos[:, :, None, :], sin[:, :, None, :]  # [B|1, L, 1, d]

    def rope4(t):
        tf = t.astype(jnp.float32)
        rot = jnp.concatenate([-tf[..., d // 2:], tf[..., : d // 2]], axis=-1)
        return (tf * c4 + rot * s4).astype(t.dtype)

    q, k = rope4(q), rope4(k)
    rep = nq // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if seg_mode:
        seg = mask  # [B, L] segment ids (0 = pad)
        valid = seg > 0
    else:
        valid = jnp.arange(l)[None, :] < mask[:, None]  # [B, L]
        seg = valid  # 0/1 mask doubles as segment ids
    blk = min(512, max(128, l))
    ctx = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), seg.astype(jnp.int32), blk, blk, True,
    ).transpose(0, 2, 1, 3)
    ctx = jnp.where(valid[:, :, None, None], ctx, 0).reshape(b, l, nq * d)
    out = jnp.dot(ctx, wo, preferred_element_type=jnp.float32)
    return (xf + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _fused_dec(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask, nq,
               nkv, d, eps, qk_norm, seg_mode):
    return _pallas_dec(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin,
                       mask, nq, nkv, d, eps, qk_norm, seg_mode)


def _fused_dec_fwd(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask,
                   nq, nkv, d, eps, qk_norm, seg_mode):
    y = _pallas_dec(x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask,
                    nq, nkv, d, eps, qk_norm, seg_mode)
    return y, (x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask)


def _fused_dec_bwd(nq, nkv, d, eps, qk_norm, seg_mode, res, g):
    x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin, mask = res
    _, vjp = jax.vjp(
        lambda *a: _unfused_reference(*a, mask, nq, nkv, d, eps, qk_norm,
                                      seg_mode),
        x, wqkv, bqkv, wo, rms_w, qn_w, kn_w, cos, sin,
    )
    return (*vjp(g.astype(x.dtype)), None)


_fused_dec.defvjp(_fused_dec_fwd, _fused_dec_bwd)


def fused_decoder_attention(
    x, wqkv, wo, rms_w, lengths=None, *, num_q_heads: int, num_kv_heads: int,
    head_dim: int, rope_theta: float = 10000.0, eps: float = 1e-6,
    bqkv=None, q_norm_w=None, k_norm_w=None, rope_cos=None, rope_sin=None,
    segment_ids=None,
):
    """y = x + o_proj(causal_GQA_attention(RoPE(QKV(RMSNorm(x))))) in one
    fused Pallas program per batch row.

    x: [B, L, H]; wqkv: [H, (nq + 2·nkv)·d] (q|k|v column blocks);
    wo: [nq·d, H]; rms_w: [H] (input_layernorm weight); lengths: [B] int32
    valid-token counts of RIGHT-padded rows. Optional ``bqkv``
    [(nq+2·nkv)·d] (Qwen2 attention bias) and ``q_norm_w``/``k_norm_w``
    [d] (Qwen3 per-head qk RMSNorm, applied before RoPE).

    ``rope_cos``/``rope_sin`` [B|1, L, head_dim] f32: precomputed full-dim
    rotary tables applied as ``t*cos + rotate_half(t)*sin`` — pass the
    Qwen-VL M-RoPE tables here (per-row 3D positions); None derives
    standard-RoPE tables from iota positions (right padding).

    ``segment_ids`` [B, L] (instead of ``lengths``): packed-rows mode —
    causal attention restricted to same-segment tokens (0 = pad). Rope
    tables are REQUIRED then (positions restart per segment, so iota
    tables would be wrong).

    Pad query rows return x unchanged — identical to the recompute graph,
    so the custom-vjp gradient is exact for any cotangent. Callers should
    fall back to the flash path when `fused_decoder_supported` is False.
    """
    if (lengths is None) == (segment_ids is None):
        raise ValueError("pass exactly one of lengths= / segment_ids=")
    seg_mode = segment_ids is not None
    if seg_mode and rope_cos is None:
        raise ValueError("segment_ids mode requires rope_cos/rope_sin "
                         "(per-segment positions, e.g. gathered from "
                         "iota_rope_tables via position_ids)")
    qw = (num_q_heads + 2 * num_kv_heads) * head_dim
    if bqkv is None:
        bqkv = jnp.zeros((qw,), jnp.float32)
    qk_norm = q_norm_w is not None
    if q_norm_w is None:
        q_norm_w = jnp.ones((head_dim,), jnp.float32)
        k_norm_w = jnp.ones((head_dim,), jnp.float32)
    if rope_cos is None:
        rope_cos, rope_sin = iota_rope_tables(x.shape[1], head_dim,
                                              rope_theta)
    mask = segment_ids if seg_mode else lengths
    return _fused_dec(x, wqkv, bqkv, wo, rms_w, q_norm_w, k_norm_w,
                      jnp.asarray(rope_cos, jnp.float32),
                      jnp.asarray(rope_sin, jnp.float32), mask,
                      num_q_heads, num_kv_heads, head_dim, eps, qk_norm,
                      seg_mode)


def fused_decoder_block(
    x, attention_mask, rope_cos, rope_sin, *, wqkv, wo, rms_w, bqkv=None,
    q_norm_w=None, k_norm_w=None, num_q_heads: int, num_kv_heads: int,
    head_dim: int, eps: float, segment_ids=None,
):
    """Model-layer entry point shared by the Llama / Qwen-VL trunks: always
    the SEGMENT kernel flavor — the 0/1 attention mask doubles as segment
    ids for unpacked rows, and the rope tables carry the REAL positions —
    so left padding, right padding and packed rows all match the unfused
    paths exactly. Centralizing this here keeps the padding-side semantics
    defined once."""
    seg = segment_ids if segment_ids is not None \
        else attention_mask.astype(jnp.int32)
    return fused_decoder_attention(
        x, wqkv, wo, rms_w, segment_ids=seg, rope_cos=rope_cos,
        rope_sin=rope_sin, bqkv=bqkv, q_norm_w=q_norm_w, k_norm_w=k_norm_w,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        head_dim=head_dim, eps=eps)


_VMEM_BUDGET = 88 * 1024 * 1024


def _vmem_estimate(h: int, l: int, nq: int, nkv: int, d: int) -> int:
    """Conservative resident-VMEM bytes for one program (see the encoder
    twin in ops/fused_encoder.py for the calibration rationale)."""
    qw = (nq + 2 * nkv) * d
    io = 4 * 2 * l * h                    # x + y, double-buffered, bf16
    weights = 2 * h * qw + 2 * nq * d * h  # wqkv + wo, bf16
    qkv = 6 * l * qw                       # f32 accum + bf16 value
    scores = 12 * l * l                    # s + p tiles, f32
    ctx = 4 * l * nq * d
    return io + weights + qkv + scores + ctx


def fused_decoder_supported(hidden_size: int, num_q_heads: int,
                            num_kv_heads: int, head_dim: int,
                            seq_len: int) -> bool:
    """Shape + VMEM gate for the fused decoder kernel."""
    return (
        hidden_size % 128 == 0
        and head_dim % 8 == 0
        and head_dim >= 16  # the half-split RoPE lane slice needs d/2 >= 8
        and num_q_heads % max(num_kv_heads, 1) == 0
        and seq_len <= 1024
        and _vmem_estimate(hidden_size, -(-seq_len // 128) * 128,
                           num_q_heads, num_kv_heads, head_dim)
        <= _VMEM_BUDGET
    )
