"""Cross-device collectives for contrastive training.

`gather_with_grad` is the TPU-native version of the reference's
`_dist_gather_tensor` (Nexus/training/embedder/text_retrieval/
modeling.py:343-403): all_gather activations across the data axis and
re-insert the local shard so gradients flow to the local tower while remote
shards contribute as constants — the standard cross-device-negatives trick,
expressed with `jax.lax.all_gather` inside the pjit'd loss instead of
torch.distributed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_with_grad(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-gather along a mesh axis keeping gradients for the local block.

    Input [B, ...] per device -> output [W*B, ...] where the slice belonging
    to this device carries gradients and the rest are stop-gradient.
    Must be called inside shard_map/pjit with `axis_name` bound.
    """
    w = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    gathered = jax.lax.stop_gradient(jax.lax.all_gather(x, axis_name, axis=0, tiled=True))
    b = x.shape[0]
    return jax.lax.dynamic_update_slice_in_dim(gathered, x, idx * b, axis=0)


def psum_mean(x, axis_name: str):
    return jax.lax.pmean(x, axis_name)
