"""Ring attention: sequence/context parallelism over an `sp` mesh axis.

Beyond the reference (its max sequence is 512 tokens on one GPU — there is
no long-context story to port): attention whose SEQUENCE axis is sharded
across devices. Each device keeps its local query chunk and accumulates
online-softmax partials while the K/V chunks rotate around the ring via
`lax.ppermute` — the [L, L] score matrix never exists, no device ever holds
more than L/S of the sequence, and the ICI transfers overlap with the next
chunk's matmuls under XLA latency hiding. This is the standard TPU recipe
(Liu et al., Ring Attention; the scaling-book's context-parallel chapter)
expressed as one shard_map program.

Masking matches ops/flash_attention.py: integer segment ids [B, L]
(0 = padding, tokens attend within their segment; a 0/1 validity mask is
the one-segment case), plus an optional causal flag using GLOBAL positions,
so packed and padded batches both work sequence-sharded.

Training-grade backward: a custom vjp runs a SECOND ring pass that
recomputes p = exp(s - lse) from the forward's saved logsumexp — the
flash-attention recipe — with the dk/dv accumulators riding the rotating
K/V carry so each chunk's gradient arrives home after exactly S hops.
Per-device residuals are O(chunk) (q/k/v chunks + out + lse); plain
autodiff through the forward scan would instead save every rotated K/V
copy, i.e. the full sequence per device — exactly what sequence
parallelism exists to avoid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30
SP_AXIS = "sp"


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: jax.Array,
    *,
    mesh: Mesh,
    axis: str = SP_AXIS,
    causal: bool = False,
) -> jax.Array:
    """Sequence-sharded attention. q/k/v: [B, H, L, D] (global), segment_ids:
    [B, L] int (0 = pad); L must divide by the `axis` size. Returns the
    [B, H, L, D] attention output, numerically equal to single-device
    softmax attention with the same masking (fully-masked query rows
    return 0, the flash_attention convention). Differentiable in q/k/v."""
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no '{axis}' axis; build with make_mesh({{'{axis}': s}})")
    n_dev = mesh.shape[axis]
    seq = q.shape[2]
    if seq % n_dev:
        raise ValueError(f"sequence {seq} not divisible over {n_dev} '{axis}' devices")
    return _ring(mesh, axis, causal, q, k, v, segment_ids)


def _ring_perm(n_dev):
    return [(src, (src + 1) % n_dev) for src in range(n_dev)]


def _valid_mask(seg_q, seg_r, q_pos, k_pos, causal):
    valid = (
        (seg_q[:, None, :, None] == seg_r[:, None, None, :])
        & (seg_q[:, None, :, None] > 0)
    )
    if causal:
        valid = valid & (q_pos[:, None] >= k_pos[None, :])[None, None]
    return valid


def _ring_fwd_impl(mesh, axis, causal, q, k, v, seg):
    n_dev = mesh.shape[axis]
    chunk = q.shape[2] // n_dev
    scale = 1.0 / math.sqrt(q.shape[-1])

    def spmd(q_c, k_c, v_c, seg_c):
        i = jax.lax.axis_index(axis)
        q_pos = i * chunk + jnp.arange(chunk)
        qf = q_c.astype(jnp.float32)

        def step(carry, t):
            k_r, v_r, seg_r, m, l, acc = carry
            j = (i - t) % n_dev
            k_pos = j * chunk + jnp.arange(chunk)
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_r.astype(jnp.float32)) * scale
            valid = _valid_mask(seg_c, seg_r, q_pos, k_pos, causal)
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_r.astype(jnp.float32))
            perm = _ring_perm(n_dev)
            k_r, v_r, seg_r = jax.lax.ppermute((k_r, v_r, seg_r), axis, perm)
            return (k_r, v_r, seg_r, m_new, l_new, acc_new), None

        b, h, _, d = q_c.shape
        m0 = jnp.full((b, h, chunk), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, chunk), jnp.float32)
        acc0 = jnp.zeros((b, h, chunk, d), jnp.float32)
        (_, _, _, m, l, acc), _ = jax.lax.scan(
            step, (k_c, v_c, seg_c, m0, l0, acc0), jnp.arange(n_dev))
        out = (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q_c.dtype)
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
        return out, lse

    seq_spec = P(None, None, axis, None)
    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=(seq_spec, P(None, None, axis)),
        check_vma=False,  # tuple carries through ppermute defeat the audit
    )
    return fn(q, k, v, seg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ring(mesh, axis, causal, q, k, v, seg):
    out, _ = _ring_fwd_impl(mesh, axis, causal, q, k, v, seg)
    return out


def _ring_fwd(mesh, axis, causal, q, k, v, seg):
    out, lse = _ring_fwd_impl(mesh, axis, causal, q, k, v, seg)
    return out, (q, k, v, seg, out, lse)


def _ring_bwd(mesh, axis, causal, res, g):
    q, k, v, seg, out, lse = res
    n_dev = mesh.shape[axis]
    chunk = q.shape[2] // n_dev
    scale = 1.0 / math.sqrt(q.shape[-1])

    def spmd(q_c, k_c, v_c, seg_c, out_c, lse_c, do_c):
        i = jax.lax.axis_index(axis)
        q_pos = i * chunk + jnp.arange(chunk)
        qf = q_c.astype(jnp.float32)
        dof = do_c.astype(jnp.float32)
        # delta = rowsum(do * out): the softmax-jacobian diagonal term
        delta = jnp.sum(dof * out_c.astype(jnp.float32), axis=-1)  # [B,H,Lq]

        def step(carry, t):
            k_r, v_r, seg_r, dk_r, dv_r, dq = carry
            j = (i - t) % n_dev
            k_pos = j * chunk + jnp.arange(chunk)
            kf = k_r.astype(jnp.float32)
            vf = v_r.astype(jnp.float32)
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
            valid = _valid_mask(seg_c, seg_r, q_pos, k_pos, causal)
            # recompute normalized probabilities off the saved logsumexp
            p = jnp.where(valid, jnp.exp(s - lse_c[..., None]), 0.0)
            dv_r = dv_r + jnp.einsum("bhqk,bhqd->bhkd", p, dof)
            dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
            ds = p * (dp - delta[..., None]) * scale
            dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
            dk_r = dk_r + jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
            perm = _ring_perm(n_dev)
            # the accumulators ride WITH their chunk: after S hops both the
            # chunk and its gradient are home
            k_r, v_r, seg_r, dk_r, dv_r = jax.lax.ppermute(
                (k_r, v_r, seg_r, dk_r, dv_r), axis, perm)
            return (k_r, v_r, seg_r, dk_r, dv_r, dq), None

        zkv = jnp.zeros(k_c.shape, jnp.float32)
        dq0 = jnp.zeros(q_c.shape, jnp.float32)
        (_, _, _, dk, dv, dq), _ = jax.lax.scan(
            step, (k_c, v_c, seg_c, zkv, jnp.zeros(v_c.shape, jnp.float32), dq0),
            jnp.arange(n_dev))
        return dq.astype(q_c.dtype), dk.astype(k_c.dtype), dv.astype(v_c.dtype)

    seq_spec = P(None, None, axis, None)
    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis), seq_spec,
                  P(None, None, axis), seq_spec),
        out_specs=(seq_spec, seq_spec, seq_spec),
        check_vma=False,
    )
    dq, dk, dv = fn(q, k, v, seg, out, lse, g)
    dseg = np.zeros(seg.shape, jax.dtypes.float0)
    return dq, dk, dv, dseg


_ring.defvjp(_ring_fwd, _ring_bwd)
