"""Device mesh construction and batch/parameter sharding helpers.

This is THE parallelism substrate: where the reference juggles
Accelerate/DDP/DeepSpeed/NCCL process groups (SURVEY §2.4), nexus_tpu has a
`jax.sharding.Mesh` and named-axis shardings compiled into pjit programs.
Collectives ride ICI automatically; multi-host runs only need
`jax.distributed.initialize()` before mesh creation.

Axes convention:
    data  — data parallel (batch axis); also the ZeRO-1 shard axis
    model — reserved for tensor-parallel / embedding-shard layouts
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh. Default: all devices on one `data` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {DATA_AXIS: len(devices)}
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names)


_default_mesh: Optional[Mesh] = None


def get_default_mesh() -> Mesh:
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = make_mesh()
    return _default_mesh


def set_default_mesh(mesh: Mesh) -> None:
    global _default_mesh
    _default_mesh = mesh


def data_parallel_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for a data-parallel step."""
    return NamedSharding(mesh, P(DATA_AXIS)), NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the leading axis.
    Scalars and 0-d entries are replicated."""
    batch_sh, rep_sh = data_parallel_shardings(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.shape[DATA_AXIS] != 0:
            return jax.device_put(x, rep_sh)
        return jax.device_put(x, batch_sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    _, rep_sh = data_parallel_shardings(mesh)
    return jax.device_put(tree, rep_sh)


def embedding_shardings(params, mesh: Mesh, min_rows: int = 1024):
    """Model-parallel row sharding for large embedding tables — the TorchRec
    row-wise table-sharding parity. Any `embedding` leaf with >= min_rows
    rows divisible by the `model` axis is sharded P('model', None); XLA
    turns the lookups into collectives over ICI. Other params replicate."""
    if MODEL_AXIS not in mesh.shape:
        raise ValueError("mesh has no 'model' axis; build with make_mesh({'data':d,'model':m})")
    m = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(MODEL_AXIS, None))

    def spec_for(path, x):
        is_embedding = any(getattr(k, "key", None) == "embedding" for k in path)
        shape = getattr(x, "shape", ())
        # uneven row counts are fine: GSPMD pads the last shard internally
        if is_embedding and len(shape) == 2 and shape[0] >= min_rows:
            return row_sharded
        return rep

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(spec_for, params)


# Megatron-style tensor-parallel layout for the transformer trunks built in
# models/{bert,llama,qwen*}.py. Column-parallel modules shard their output
# features over the `model` axis; the row-parallel modules that consume them
# shard the matching input dim, so XLA inserts exactly one all-reduce per
# block (after o_proj / down_proj) — the classic TP recipe expressed as
# param shardings + GSPMD propagation instead of hand-written collectives.
# (The reference has no TP at all — its scaling story stops at ZeRO-1 DP,
# SURVEY §2.4; this goes beyond it.)
_TP_COLUMN = frozenset({
    "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",  # llama/qwen
    "query", "key", "value", "intermediate_dense",  # bert
    # fused_qkv=True BERT packs q|k|v into one [h, 3h] kernel; column
    # sharding it is still correct (GSPMD reshards at the head split) and
    # keeps the attention weights distributed rather than silently
    # replicated
    "qkv",
})
_TP_ROW = frozenset({
    "o_proj", "down_proj",  # llama/qwen
    "attention_output_dense", "output_dense",  # bert
})


def tensor_parallel_shardings(params, mesh: Mesh):
    """Tensor-parallel NamedShardings for a transformer param tree.

    Rules (matched on exact path-component names, so LoRA subtrees like
    ``q_proj/base/kernel`` follow their parent module):
      - column-parallel kernels/biases shard the LAST dim over `model`
      - row-parallel kernels shard the second-to-last dim (their biases
        replicate — added after the all-reduce)
      - scan-stacked leading layer dims stay unsharded
      - any dim not divisible by the `model` axis size replicates
      - everything else (embeddings, norms, heads, lora_A/B) replicates

    Heads must divide the axis for an efficient layout (num_attention_heads
    and num_key_value_heads % tp == 0); GSPMD stays *correct* regardless.
    Note the fused megakernels assume full-width weights per program — use
    ``attention_impl='xla'|'pallas'`` under TP.
    """
    if MODEL_AXIS not in mesh.shape:
        raise ValueError("mesh has no 'model' axis; build with make_mesh({'data':d,'model':m})")
    tp = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def spec_for(path, x):
        names = [getattr(k, "key", None) for k in path]
        leaf = names[-1] if names else None
        shape = getattr(x, "shape", ())
        nd = len(shape)
        if any(n in _TP_COLUMN for n in names):
            if leaf in ("kernel", "bias") and nd >= 1 and shape[-1] % tp == 0:
                return NamedSharding(mesh, P(*([None] * (nd - 1)), MODEL_AXIS))
        elif any(n in _TP_ROW for n in names):
            if leaf == "kernel" and nd >= 2 and shape[-2] % tp == 0:
                return NamedSharding(mesh, P(*([None] * (nd - 2)), MODEL_AXIS, None))
        return rep

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(spec_for, params)


def expert_parallel_shardings(params, mesh: Mesh, expert_names=("experts",)):
    """Expert parallelism for the vmapped expert stacks (MMoE/MultiExperts,
    modules/feature_interaction.py): every leaf under a module named in
    ``expert_names`` carries the expert axis FIRST (the nn.vmap layout), so
    sharding axis 0 over `model` puts n_experts/tp experts per chip — each
    device runs its experts' batched matmul and GSPMD all-gathers the [B, E,
    H] outputs for the gates. Dense routing (all experts active, as in MMoE)
    makes this the whole story; indivisible expert counts replicate."""
    if MODEL_AXIS not in mesh.shape:
        raise ValueError("mesh has no 'model' axis; build with make_mesh({'data':d,'model':m})")
    tp = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def spec_for(path, x):
        names = [getattr(k, "key", None) for k in path]
        shape = getattr(x, "shape", ())
        if any(n in expert_names for n in names) and len(shape) >= 1 and shape[0] % tp == 0:
            return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (len(shape) - 1))))
        return rep

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(spec_for, params)


def zero1_shardings(tree, mesh: Mesh):
    """ZeRO-1-style sharding spec for an optimizer-state pytree: each array
    leaf is sharded along its largest divisible axis over the data axis
    (optimizer moments are per-parameter, so this splits the optimizer
    memory W-ways exactly like DeepSpeed stage 1); scalars and indivisible
    leaves replicate. Returns a pytree of NamedSharding."""
    n = mesh.shape[DATA_AXIS]
    rep = NamedSharding(mesh, P())

    def spec(x):
        shape = getattr(x, "shape", ())
        for axis, dim in enumerate(shape):
            if dim % n == 0 and dim >= n:
                parts = [None] * len(shape)
                parts[axis] = DATA_AXIS
                return NamedSharding(mesh, P(*parts))
        return rep

    return jax.tree_util.tree_map(spec, tree)
