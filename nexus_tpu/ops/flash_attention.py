"""Pallas flash attention for TPU (forward AND blocked backward).

Blocked online-softmax attention (Flash-Attention recipe) as Pallas TPU
kernels: the [L, L] score matrix never materializes in HBM. Replaces the
reference's flash-attn-2 dependency (SURVEY §2.3) for encoder workloads and
the VLM eval path.

Masking is SEGMENT-based: the mask argument is integer segment ids [B, L]
(0 = padding; tokens attend only within their own segment). A plain 0/1
padding mask is the one-segment special case, so both packed and unpacked
batches flow through the same kernel.

Backward: the FlashAttention-2 two-kernel recipe —
  1. dkv kernel, grid over key blocks: streams q/do blocks, recomputes
     p = exp(s - lse) from the forward's saved logsumexp, accumulates
     dk = (dp ⊙ p)ᵀ q and dv = pᵀ do;
  2. dq kernel, grid over query blocks: streams k/v blocks, accumulates
     dq = (dp ⊙ p) k, with delta = rowsum(do ⊙ o) folded in.
Memory is O(L·D) — no [L, L] tensor is ever rematerialized (the round-1
implementation fell back to a full XLA attention vjp here, which was the
top training-throughput blocker in BENCH_NOTES).

Interface: `flash_attention(q, k, v, segment_ids)` with q/k/v: [B, H, L, D],
segment_ids: [B, L] int (or bool validity mask).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(
    seg_ref, qseg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, block_k: int, sm_scale: float, causal: bool,
):
    # q_ref: [BQ, D]; k_ref/v_ref: [L, D]; seg_ref: [1, L]; qseg_ref: [1, BQ]
    bq, d = q_ref.shape
    l = k_ref.shape[0]
    q = q_ref[:] * sm_scale
    q_seg = qseg_ref[0, :]  # [BQ]
    qi = pl.program_id(1)
    q_offset = qi * bq

    n_blocks = l // block_k
    if causal:
        n_blocks_eff = jnp.minimum(n_blocks, pl.cdiv(q_offset + bq, block_k))
    else:
        n_blocks_eff = n_blocks

    def body(i, carry):
        m_prev, denom_prev, acc_prev = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]  # [BK, D]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        k_seg = seg_ref[0, pl.ds(i * block_k, block_k)]  # [BK]
        keep = (k_seg[None, :] == q_seg[:, None]) & (k_seg[None, :] > 0)
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            keep = jnp.logical_and(keep, k_pos <= q_pos)
        s = jnp.where(keep, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BK]
        correction = jnp.exp(m_prev - m_new)
        denom_new = denom_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * correction + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, denom_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    d0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, denom, acc = jax.lax.fori_loop(0, n_blocks_eff, body, (m0, d0, a0))
    o_ref[:] = (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)
    # logsumexp per query row, saved for the backward recompute
    lse_ref[0, :] = (m[:, 0] + jnp.log(jnp.maximum(denom[:, 0], 1e-30)))


def _flash_forward(q, k, v, segment_ids, block_q: int, block_k: int,
                   causal: bool = False, with_lse: bool = False):
    b, h, l, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    orig_l = l
    block = max(block_q, block_k)
    l_pad = -(-l // block) * block
    if l_pad != l:
        pad = ((0, 0), (0, 0), (0, l_pad - l), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        segment_ids = jnp.pad(segment_ids, ((0, 0), (0, l_pad - l)))
        l = l_pad

    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    seg = jnp.repeat(segment_ids.astype(jnp.int32), h, axis=0).reshape(b * h, 1, l)

    grid = (b * h, l // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, sm_scale=sm_scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, l), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, 1, block_q), lambda bh, qi: (bh, 0, qi)),
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, 1, block_q), lambda bh, qi: (bh, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, l), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(seg, seg, qf, kf, vf)
    out = out.reshape(b, h, l, d)[:, :, :orig_l, :]
    if with_lse:
        return out, lse.reshape(b, h, l)[:, :, :orig_l], seg, l
    return out


# ---------------------------------------------------------------------------
# padded fast path: right-padded rows, per-row valid length
# ---------------------------------------------------------------------------
#
# Corpus-encode / cross-encoder batches are RIGHT-padded, so the mask is
# fully described by one scalar per row: its valid length. The mask becomes
# an iota-vs-scalar compare computed in registers — no segment-id VMEM loads,
# no [B*H, L] id replication in HBM. Measured on chip (v5e, 64x12x512x64):
# the iota compare is FREE next to the block matmuls, while a DYNAMIC loop
# bound costs ~13% (Mosaic can't unroll) and a lax.cond tail ~10% — and
# shrinking block_k to skip dead padding blocks loses more per-block
# efficiency than the skip recovers at every realistic length mix. Hence the
# shape of this kernel: STATIC loop over all key blocks, masked every block.
# (~17% over the segment kernel at seq 512, matching jax's bundled
# flash_attention kernel while keeping our padding semantics.)

def _flash_fwd_padded_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, block_k: int, sm_scale: float, heads: int,
):
    # q_ref: [BQ, D]; k_ref/v_ref: [L, D]; lens_ref: [B] int32 (SMEM)
    bq, d = q_ref.shape
    l = k_ref.shape[0]
    q = q_ref[:] * sm_scale
    length = lens_ref[pl.program_id(0) // heads]

    def body(i, carry):
        m_prev, denom_prev, acc_prev = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(k_pos < length, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        denom_new = denom_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * correction + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, denom_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    d0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, denom, acc = jax.lax.fori_loop(0, l // block_k, body, (m0, d0, a0))
    # zero padded QUERY rows: exact parity with the segment-mask semantics
    # (and keeps the custom vjp consistent for any cotangent)
    q_pos = pl.program_id(1) * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    o = jnp.where(q_pos < length, acc / jnp.maximum(denom, 1e-30), 0.0)
    o_ref[:] = o.astype(o_ref.dtype)
    lse_ref[0, :] = m[:, 0] + jnp.log(jnp.maximum(denom[:, 0], 1e-30))


def _flash_forward_padded(q, k, v, lengths, block_q: int, block_k: int,
                          with_lse: bool = False):
    b, h, l, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    orig_l = l
    block = max(block_q, block_k)
    l_pad = -(-l // block) * block
    if l_pad != l:
        pad = ((0, 0), (0, 0), (0, l_pad - l), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        l = l_pad

    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    lens = jnp.clip(lengths.astype(jnp.int32), 0, orig_l)

    grid = (b * h, l // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_padded_kernel, block_k=block_k,
                          sm_scale=sm_scale, heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda bh, qi, lens: (bh, qi, 0)),
                pl.BlockSpec((None, l, d), lambda bh, qi, lens: (bh, 0, 0)),
                pl.BlockSpec((None, l, d), lambda bh, qi, lens: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, block_q, d), lambda bh, qi, lens: (bh, qi, 0)),
                pl.BlockSpec((None, 1, block_q), lambda bh, qi, lens: (bh, 0, qi)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, l), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(lens, qf, kf, vf)
    out = out.reshape(b, h, l, d)[:, :, :orig_l, :]
    if with_lse:
        return out, lse.reshape(b, h, l)[:, :, :orig_l]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_padded(q, k, v, lengths, block_q: int = 128, block_k: int = 128):
    """Flash attention for RIGHT-padded batches: q/k/v [B, H, L, D], lengths
    [B] int (#valid tokens per row; tokens attend to positions < length).

    Semantically equal to `flash_attention` with segment ids
    `arange(L) < lengths[:, None]`, but the mask is an iota-vs-scalar
    compare computed in registers — no segment-id VMEM loads or [B*H, L]
    id replication in HBM (~17% faster at seq 512; see the header comment:
    a dynamic loop bound that would SKIP dead key blocks was measured at
    ~13% WORSE, so the kernel deliberately runs a static masked loop).
    The right call for corpus encode and padded cross-encoder scoring.
    NOT valid for left-padded or packed inputs (use `flash_attention`)."""
    return _flash_forward_padded(q, k, v, lengths, block_q, block_k)


def _padded_fwd(q, k, v, lengths, block_q, block_k):
    out, lse = _flash_forward_padded(q, k, v, lengths, block_q, block_k,
                                     with_lse=True)
    return out, (q, k, v, lengths, out, lse)


def _flash_bwd_padded_dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, block_q: int, sm_scale: float, heads: int,
):
    # k_ref/v_ref: [BK, D]; q_ref/do_ref: [L, D]; lse/delta: [1, L]
    bk, d = k_ref.shape
    l = q_ref.shape[0]
    length = lens_ref[pl.program_id(0) // heads]
    k_offset = pl.program_id(1) * bk
    k_blk = k_ref[:]
    v_blk = v_ref[:]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[0, pl.ds(i * block_q, block_q)]
        delta_blk = delta_ref[0, pl.ds(i * block_q, block_q)]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * sm_scale
        q_pos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
        k_pos = k_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
        keep = (q_pos < length) & (k_pos < length)
        p = jnp.where(keep, jnp.exp(s - lse_blk[:, None]), 0.0)
        dv_new = dv_acc + jnp.dot(p.astype(do_blk.dtype).T, do_blk,
                                  preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk[:, None]) * sm_scale
        dk_new = dk_acc + jnp.dot(ds.astype(q_blk.dtype).T, q_blk,
                                  preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, l // block_q, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_bwd_padded_dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, *, block_k: int, sm_scale: float, heads: int,
):
    bq, d = q_ref.shape
    l = k_ref.shape[0]
    length = lens_ref[pl.program_id(0) // heads]
    q_offset = pl.program_id(1) * bq
    q_blk = q_ref[:]
    do_blk = do_ref[:]
    lse_blk = lse_ref[0, :]
    delta_blk = delta_ref[0, :]

    def body(i, dq_acc):
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * sm_scale
        q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
        k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        keep = (q_pos < length) & (k_pos < length)
        p = jnp.where(keep, jnp.exp(s - lse_blk[:, None]), 0.0)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk[:, None]) * sm_scale
        return dq_acc + jnp.dot(ds.astype(k_blk.dtype), k_blk,
                                preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, l // block_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_backward_padded(res, g, block_q: int, block_k: int):
    """Same two-kernel FA-2 recipe as `_flash_backward`, with the prefix mask
    as iota-vs-length compares — no segment-id loads or [B*H, L] replication."""
    q, k, v, lengths, out, lse = res
    b, h, l_orig, d = q.shape
    block = max(block_q, block_k)
    l = -(-l_orig // block) * block
    if l != l_orig:
        pad = ((0, 0), (0, 0), (0, l - l_orig), (0, 0))
        q, k, v, g, out = (jnp.pad(t, pad) for t in (q, k, v, g, out))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, l - l_orig)))

    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    dof = g.reshape(b * h, l, d)
    sm_scale = 1.0 / math.sqrt(d)
    lens = jnp.clip(lengths.astype(jnp.int32), 0, l_orig)
    lsef = lse.reshape(b * h, 1, l)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    deltaf = delta.reshape(b * h, 1, l)

    interp = jax.default_backend() == "cpu"
    full = lambda bh, i, *a: (bh, 0, 0)  # noqa: E731
    row_blk = lambda bsz: pl.BlockSpec((None, 1, bsz), lambda bh, i, *a: (bh, 0, i))  # noqa: E731
    mat_blk = lambda bsz: pl.BlockSpec((None, bsz, d), lambda bh, i, *a: (bh, i, 0))  # noqa: E731
    mat_full = pl.BlockSpec((None, l, d), full)
    row_full = pl.BlockSpec((None, 1, l), full)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_padded_dkv_kernel, block_q=block_q,
                          sm_scale=sm_scale, heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, l // block_k),
            in_specs=[mat_full, mat_blk(block_k), mat_blk(block_k), mat_full,
                      row_full, row_full],
            out_specs=[mat_blk(block_k), mat_blk(block_k)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, l, d), v.dtype)],
        interpret=interp,
    )(lens, qf, kf, vf, dof, lsef, deltaf)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_padded_dq_kernel, block_k=block_k,
                          sm_scale=sm_scale, heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, l // block_q),
            in_specs=[mat_blk(block_q), mat_full, mat_full, mat_blk(block_q),
                      row_blk(block_q), row_blk(block_q)],
            out_specs=mat_blk(block_q),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        interpret=interp,
    )(lens, qf, kf, vf, dof, lsef, deltaf)

    to4 = lambda t: t.reshape(b, h, l, d)[:, :, :l_orig, :]  # noqa: E731
    return to4(dq), to4(dk), to4(dv), None


def _padded_bwd(block_q, block_k, res, g):
    return _flash_backward_padded(res, g, block_q, block_k)


flash_attention_padded.defvjp(_padded_fwd, _padded_bwd)


# ---------------------------------------------------------------------------
# backward: dkv kernel (grid over key blocks) + dq kernel (grid over q blocks)
# ---------------------------------------------------------------------------

def _flash_bwd_dkv_kernel(
    seg_ref, kseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, block_q: int, sm_scale: float, causal: bool,
):
    # k_ref/v_ref: [BK, D]; q_ref/do_ref: [L, D]; lse/delta: [1, L];
    # seg_ref: [1, L] (all segs); kseg_ref: [1, BK]
    bk, d = k_ref.shape
    l = q_ref.shape[0]
    ki = pl.program_id(1)
    k_offset = ki * bk
    k_seg = kseg_ref[0, :]  # [BK]
    k_blk = k_ref[:]
    v_blk = v_ref[:]

    n_blocks = l // block_q
    if causal:
        # query blocks strictly before this key block see nothing of it
        start_block = k_offset // block_q
    else:
        start_block = 0

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[pl.ds(i * block_q, block_q), :]  # [BQ, D]
        do_blk = do_ref[pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[0, pl.ds(i * block_q, block_q)]  # [BQ]
        delta_blk = delta_ref[0, pl.ds(i * block_q, block_q)]
        q_seg = seg_ref[0, pl.ds(i * block_q, block_q)]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * sm_scale
        keep = (k_seg[None, :] == q_seg[:, None]) & (k_seg[None, :] > 0)
        if causal:
            q_pos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
            k_pos = k_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
            keep = jnp.logical_and(keep, k_pos <= q_pos)
        # exact softmax via saved lse; explicit zero where masked (a fully
        # masked q row has lse ~ NEG_INF and exp(s - lse) would overflow)
        p = jnp.where(keep, jnp.exp(s - lse_blk[:, None]), 0.0)  # [BQ, BK]
        dv_new = dv_acc + jnp.dot(p.astype(do_blk.dtype).T, do_blk,
                                  preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk[:, None]) * sm_scale  # [BQ, BK]
        dk_new = dk_acc + jnp.dot(ds.astype(q_blk.dtype).T, q_blk,
                                  preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_block, n_blocks, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    seg_ref, qseg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, *, block_k: int, sm_scale: float, causal: bool,
):
    # q_ref/do_ref: [BQ, D]; k_ref/v_ref: [L, D]; lse/delta: [1, BQ]
    bq, d = q_ref.shape
    l = k_ref.shape[0]
    qi = pl.program_id(1)
    q_offset = qi * bq
    q_blk = q_ref[:]
    do_blk = do_ref[:]
    lse_blk = lse_ref[0, :]
    delta_blk = delta_ref[0, :]
    q_seg = qseg_ref[0, :]

    n_blocks = l // block_k
    if causal:
        n_blocks_eff = jnp.minimum(n_blocks, pl.cdiv(q_offset + bq, block_k))
    else:
        n_blocks_eff = n_blocks

    def body(i, dq_acc):
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        k_seg = seg_ref[0, pl.ds(i * block_k, block_k)]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * sm_scale
        keep = (k_seg[None, :] == q_seg[:, None]) & (k_seg[None, :] > 0)
        if causal:
            q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            keep = jnp.logical_and(keep, k_pos <= q_pos)
        p = jnp.where(keep, jnp.exp(s - lse_blk[:, None]), 0.0)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk[:, None]) * sm_scale
        return dq_acc + jnp.dot(ds.astype(k_blk.dtype), k_blk,
                                preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, n_blocks_eff, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_backward(res, g, block_q: int, block_k: int, causal: bool):
    q, k, v, segment_ids, out, lse = res
    b, h, l_orig, d = q.shape
    block = max(block_q, block_k)
    l = -(-l_orig // block) * block
    if l != l_orig:
        pad = ((0, 0), (0, 0), (0, l - l_orig), (0, 0))
        q, k, v, g, out = (jnp.pad(t, pad) for t in (q, k, v, g, out))
        segment_ids = jnp.pad(segment_ids, ((0, 0), (0, l - l_orig)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, l - l_orig)))

    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    dof = g.reshape(b * h, l, d)
    sm_scale = 1.0 / math.sqrt(d)
    seg = jnp.repeat(segment_ids.astype(jnp.int32), h, axis=0).reshape(b * h, 1, l)
    lsef = lse.reshape(b * h, 1, l)
    # delta_i = rowsum(dO_i * O_i): the dsoftmax "diagonal" correction
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    deltaf = delta.reshape(b * h, 1, l)

    interp = jax.default_backend() == "cpu"
    full = lambda bh, i: (bh, 0, 0)  # noqa: E731
    row_blk = lambda bsz: pl.BlockSpec((None, 1, bsz), lambda bh, i: (bh, 0, i))  # noqa: E731
    mat_blk = lambda bsz: pl.BlockSpec((None, bsz, d), lambda bh, i: (bh, i, 0))  # noqa: E731
    mat_full = pl.BlockSpec((None, l, d), full)
    row_full = pl.BlockSpec((None, 1, l), full)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, sm_scale=sm_scale,
                          causal=causal),
        grid=(b * h, l // block_k),
        in_specs=[row_full, row_blk(block_k), mat_full, mat_blk(block_k),
                  mat_blk(block_k), mat_full, row_full, row_full],
        out_specs=[mat_blk(block_k), mat_blk(block_k)],
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, l, d), v.dtype)],
        interpret=interp,
    )(seg, seg, qf, kf, vf, dof, lsef, deltaf)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, sm_scale=sm_scale,
                          causal=causal),
        grid=(b * h, l // block_q),
        in_specs=[row_full, row_blk(block_q), mat_blk(block_q), mat_full,
                  mat_full, mat_blk(block_q), row_blk(block_q), row_blk(block_q)],
        out_specs=mat_blk(block_q),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        interpret=interp,
    )(seg, seg, qf, kf, vf, dof, lsef, deltaf)

    to4 = lambda t: t.reshape(b, h, l, d)[:, :, :l_orig, :]  # noqa: E731
    return to4(dq), to4(dk), to4(dv), None


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _reference_attention(q, k, v, segment_ids, causal: bool = False):
    """Plain-XLA attention with the same segment-mask semantics (used by
    tests as the numerical oracle)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(d)
    seg = segment_ids.astype(jnp.int32)
    allowed = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] != 0)
    bias = jnp.where(allowed[:, None], 0.0, NEG_INF)
    if causal:
        l = q.shape[2]
        tri = jnp.tril(jnp.ones((l, l), bool))
        bias = bias + jnp.where(tri[None, None], 0.0, NEG_INF)
    p = jax.nn.softmax(s + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def flash_vision_attention(q, k, v, segment_ids=None,
                           block_q: int = 128, block_k: int = 128):
    """Flash attention for vision towers: q/k/v **[B, L, H, Dh]** (the
    head-minor layout vision blocks produce straight from their QKV split),
    optional integer segment ids [L] or [B, L] for per-frame block-diagonal
    attention (video: HF cu_seqlens = repeat(h*w, t) semantics). Non-causal.

    Handles the Qwen-VL head dims that aren't a multiple of the 128-lane
    register width (e.g. 80 = 1280/16): q/k/v are zero-padded on the head
    dim and the softmax scale is pre-corrected so padding is exact —
    zero-padded channels contribute nothing to q·k, and the padded output
    channels are sliced off. XLA pays the same lane padding inside its
    dense attention einsums, so this costs nothing extra relative to the
    unfused path while the [L, L] score matrix (16 heads x 4k² patches for
    a large image) never touches HBM.
    """
    b, l, h, d = q.shape
    if segment_ids is None:
        seg = jnp.ones((b, l), jnp.int32)
    else:
        seg = jnp.asarray(segment_ids, jnp.int32)
        if seg.ndim == 1:
            seg = jnp.broadcast_to(seg[None, :], (b, l))
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    lane = 128
    if d % lane and jax.default_backend() != "cpu":
        d_pad = -(-d // lane) * lane
        # kernel scales by 1/sqrt(d_pad); fold the correction into q so the
        # effective scale stays 1/sqrt(d)
        qt = qt * math.sqrt(d_pad / d)
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        qt, kt, vt = jnp.pad(qt, pad), jnp.pad(kt, pad), jnp.pad(vt, pad)
    out = flash_attention(qt, kt, vt, seg, block_q, block_k)
    return jnp.transpose(out[..., :d], (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, segment_ids, block_q: int = 128, block_k: int = 128,
                    causal: bool = False):
    """Segment-masked flash attention: [B, H, L, D] x3 + segment ids [B, L]
    (a 0/1 validity mask is the one-segment case); optional causal masking
    (decoder mode, with dead key-block skipping)."""
    return _flash_forward(q, k, v, segment_ids, block_q, block_k, causal)


def _fwd(q, k, v, segment_ids, block_q, block_k, causal):
    out, lse, _, _ = _flash_forward(
        q, k, v, segment_ids, block_q, block_k, causal, with_lse=True
    )
    return out, (q, k, v, segment_ids, out, lse)


def _bwd(block_q, block_k, causal, res, g):
    return _flash_backward(res, g, block_q, block_k, causal)


flash_attention.defvjp(_fwd, _bwd)
