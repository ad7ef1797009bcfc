"""GPipe-style pipeline parallelism over a `stage` mesh axis.

Beyond the reference (whose model parallelism stops at ZeRO-1 optimizer
sharding, SURVEY §2.4): a scan-over-layers transformer stack — the layout
every big trunk in this framework already uses (models/bert.py,
models/llama.py stack layer params on a leading L axis) — is split into S
contiguous stages, one per device along the `stage` mesh axis, and
microbatches flow through the classic GPipe fill/drain schedule:

    tick t:  stage s applies its L/S layers to microbatch (t - s), then
             `lax.ppermute` hands its activations to stage s+1; stage 0
             injects fresh microbatch t while the pipe fills.

M microbatches take M + S - 1 ticks (bubble fraction (S-1)/(M+S-1)).
Everything is one SPMD program under `shard_map`: layer params arrive
pre-sharded P('stage') on the stacked axis so each device materializes only
its own stage's weights — THE reason to pipeline: an L-layer model whose
parameters exceed one chip's HBM runs with L/S layers resident per chip.

Autodiff just works: `jax.grad` of a loss through `pipeline_layers` runs
the reverse fill/drain schedule via the `ppermute` transpose. This is the
correctness-first schedule — all in-flight microbatch activations are live
(wrap `layer_apply` in `jax.checkpoint` to trade them for recompute); 1F1B
and interleaved schedules are follow-on optimizations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

STAGE_AXIS = "stage"


def pipeline_layers(
    layer_apply: Callable[[Any, jax.Array, Any], jax.Array],
    stacked_params,
    x: jax.Array,
    extras: Optional[Any] = None,
    *,
    mesh: Mesh,
    n_microbatches: int,
    stage_axis: str = STAGE_AXIS,
):
    """Run a stacked layer pytree as an S-stage pipeline over ``mesh``.

    layer_apply(one_layer_params, h, extra) -> h applies ONE layer;
    ``stacked_params`` leaves carry the layer axis first ([L, ...], the
    nn.scan layout); ``x`` is the [B, ...] batch, split into
    ``n_microbatches`` along axis 0; ``extras`` is an optional pytree of
    per-example auxiliaries ([B, ...], e.g. attention masks) that each
    stage indexes for the microbatch it is currently processing.

    Requires L % S == 0 (contiguous layer blocks per stage) and
    B % n_microbatches == 0. Returns the [B, ...] output of the last layer.
    """
    if stage_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no '{stage_axis}' axis; build with make_mesh({{'{stage_axis}': s}})"
        )
    n_stages = mesh.shape[stage_axis]
    layer_leaves = jax.tree_util.tree_leaves(stacked_params)
    n_layers = layer_leaves[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split over {n_stages} stages")
    batch = x.shape[0]
    m = n_microbatches
    if batch % m:
        raise ValueError(f"batch {batch} not divisible into {m} microbatches")
    mb = batch // m

    xs = x.reshape((m, mb) + x.shape[1:])
    extras = {} if extras is None else extras
    exs = jax.tree_util.tree_map(
        lambda e: jnp.asarray(e).reshape((m, mb) + jnp.asarray(e).shape[1:]), extras
    )

    def spmd(local_params, xs, exs):
        s = jax.lax.axis_index(stage_axis)

        def local_stack(h, ex):
            def body(carry, p):
                return layer_apply(p, carry, ex), None

            out, _ = jax.lax.scan(body, h, local_params)
            return out

        def tick(state, t):
            idx = jnp.clip(t - s, 0, m - 1)
            ex = jax.tree_util.tree_map(
                lambda e: jax.lax.dynamic_index_in_dim(e, idx, 0, keepdims=False), exs
            )
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            state = jnp.where(s == 0, inject, state)
            state = local_stack(state, ex)
            # replicate the last stage's finished microbatch to every device
            out = jax.lax.psum(
                jnp.where(s == n_stages - 1, state, jnp.zeros_like(state)), stage_axis
            )
            state = jax.lax.ppermute(
                state, stage_axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return state, out

        state0 = jnp.zeros(xs.shape[1:], xs.dtype)
        _, outs = jax.lax.scan(tick, state0, jnp.arange(m + n_stages - 1))
        return outs[n_stages - 1 :]  # drop the fill ticks

    param_specs = jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params)
    ex_specs = jax.tree_util.tree_map(lambda _: P(), exs)
    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(param_specs, P(), ex_specs),
        out_specs=P(),
        check_vma=False,  # the psum makes `outs` replicated; skip the audit
    )
    out = fn(stacked_params, xs, exs)
    return out.reshape((batch,) + out.shape[2:])


def stage_shardings(stacked_params, mesh: Mesh, stage_axis: str = STAGE_AXIS):
    """NamedShardings placing each stacked-layer leaf P('stage') on its layer
    axis — device_put the params with these BEFORE pipeline_layers so each
    chip only ever holds its own stage's weights."""
    sh = NamedSharding(mesh, P(stage_axis))
    return jax.tree_util.tree_map(lambda _: sh, stacked_params)
