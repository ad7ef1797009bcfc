"""Pallas flash attention for TPU.

Blocked online-softmax attention (Flash-Attention recipe) as a Pallas TPU
kernel: the [L, L] score matrix never materializes in HBM; each (batch*head,
q-block) program streams key/value blocks through VMEM keeping running
(max, denominator, accumulator) statistics. Replaces the reference's
flash-attn-2 dependency (SURVEY §2.3) for encoder workloads and the VLM
eval path.

Forward-only custom-vjp: the backward pass recomputes attention with plain
XLA ops (rematerialized; exact gradients). For the ≤512-token encoder
workloads this framework targets, the forward kernel is where the win is.

Interface: `flash_attention(q, k, v, padding_mask)` with
q/k/v: [B, H, L, D], padding_mask: [B, L] True at VALID positions.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(
    mask_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float, causal: bool
):
    # q_ref: [BQ, D]; k_ref/v_ref: [L, D]; mask_ref: [1, L]; o_ref: [BQ, D]
    bq, d = q_ref.shape
    l = k_ref.shape[0]
    q = q_ref[:] * sm_scale
    qi = pl.program_id(1)
    q_offset = qi * bq

    n_blocks = l // block_k
    if causal:
        # key blocks strictly after this query block contribute nothing
        n_blocks_eff = jnp.minimum(n_blocks, pl.cdiv(q_offset + bq, block_k))
    else:
        n_blocks_eff = n_blocks

    def body(i, carry):
        m_prev, denom_prev, acc_prev = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]  # [BK, D]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        valid = mask_ref[0, pl.ds(i * block_k, block_k)]  # [BK]
        keep = valid[None, :] > 0
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


def _flash_forward(q, k, v, padding_mask, block_q: int, block_k: int, causal: bool = False):
    b, h, l, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    orig_l = l
    # pad L to a multiple of the block sizes
    block = max(block_q, block_k)
    l_pad = -(-l // block) * block
    if l_pad != l:
        pad = ((0, 0), (0, 0), (0, l_pad - l), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        padding_mask = jnp.pad(padding_mask, ((0, 0), (0, l_pad - l)))
        l = l_pad

    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    mask = jnp.repeat(padding_mask.astype(jnp.int32), h, axis=0).reshape(b * h, 1, l)

    grid = (b * h, l // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, l), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((None, l, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(mask, qf, kf, vf)
    out = out.reshape(b, h, l, d)
    return out[:, :, :orig_l, :]


def _reference_attention(q, k, v, padding_mask, causal: bool = False):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(d)
    bias = jnp.where(padding_mask[:, None, None, :], 0.0, NEG_INF)
    if causal:
        l = q.shape[2]
        tri = jnp.tril(jnp.ones((l, l), bool))
        bias = bias + jnp.where(tri[None, None], 0.0, NEG_INF)
    p = jax.nn.softmax(s + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, padding_mask, block_q: int = 128, block_k: int = 128,
                    causal: bool = False):
    """Masked flash attention: [B, H, L, D] x3 + key mask [B, L]; optional
    causal masking (decoder mode, with dead key-block skipping)."""
    return _flash_forward(q, k, v, padding_mask, block_q, block_k, causal)


def _fwd(q, k, v, padding_mask, block_q, block_k, causal):
    out = _flash_forward(q, k, v, padding_mask, block_q, block_k, causal)
    return out, (q, k, v, padding_mask)


def _bwd(block_q, block_k, causal, res, g):
    q, k, v, padding_mask = res
    # rematerialized exact backward through the reference formulation
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, padding_mask, causal), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
