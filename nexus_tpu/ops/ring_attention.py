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

Gradients flow by plain autodiff through the scan-over-ring (residuals keep
the rotated K/V chunks — O(L·D) per device, same order as the forward); a
recompute custom-vjp is the follow-on optimization if backward memory ever
binds before sequence length does.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
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
    return 0, the flash_attention convention)."""
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no '{axis}' axis; build with make_mesh({{'{axis}': s}})")
    n_dev = mesh.shape[axis]
    seq = q.shape[2]
    if seq % n_dev:
        raise ValueError(f"sequence {seq} not divisible over {n_dev} '{axis}' devices")
    chunk = seq // n_dev
    scale = 1.0 / math.sqrt(q.shape[-1])

    def spmd(q_c, k_c, v_c, seg_c):
        i = jax.lax.axis_index(axis)
        seg_q = seg_c  # [B, Lc] — this device's query segment ids
        q_pos = i * chunk + jnp.arange(chunk)  # global positions

        def step(carry, t):
            k_r, v_r, seg_r, m, l, acc = carry
            j = (i - t) % n_dev  # which global chunk the rotating K/V is now
            k_pos = j * chunk + jnp.arange(chunk)
            s = jnp.einsum("bhqd,bhkd->bhqk", q_c, k_r,
                           preferred_element_type=jnp.float32) * scale
            valid = (
                (seg_q[:, None, :, None] == seg_r[:, None, None, :])
                & (seg_q[:, None, :, None] > 0)
            )
            if causal:
                valid = valid & (q_pos[:, None] >= k_pos[None, :])[None, None]
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_r.astype(jnp.float32))
            perm = [(src, (src + 1) % n_dev) for src in range(n_dev)]
            k_r, v_r, seg_r = jax.lax.ppermute((k_r, v_r, seg_r), axis, perm)
            return (k_r, v_r, seg_r, m_new, l_new, acc_new), None

        b, h, _, d = q_c.shape
        m0 = jnp.full((b, h, chunk), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, chunk), jnp.float32)
        acc0 = jnp.zeros((b, h, chunk, d), jnp.float32)
        (_, _, _, _, l, acc), _ = jax.lax.scan(
            step, (k_c, v_c, seg_c, m0, l0, acc0), jnp.arange(n_dev))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(q_c.dtype)

    seq_spec = P(None, None, axis, None)
    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec,
        check_vma=False,  # tuple carries through ppermute defeat the audit
    )
    return fn(q, k, v, segment_ids)
