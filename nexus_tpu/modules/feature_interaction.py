"""Feature-interaction blocks (parity: Nexus/modules/feature_interaction.py:9-71)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class FactorizationMachine(nn.Module):
    """Second-order FM interaction over stacked field embeddings [B, F, D] -> [B, 1]."""

    @nn.compact
    def __call__(self, inputs: Array) -> Array:
        square_of_sum = jnp.sum(inputs, axis=1) ** 2
        sum_of_square = jnp.sum(inputs**2, axis=1)
        ix = 0.5 * (square_of_sum - sum_of_square)
        return jnp.sum(ix, axis=1, keepdims=True)


class CrossNetwork(nn.Module):
    """DCN-v2 cross network: x_{l+1} = x0 * W_l(x_l) + x_l.

    The layer loop is a static Python loop (n_layers is a hyperparameter),
    so XLA sees a fully unrolled chain of fused multiply-adds around dense
    matmuls on the MXU.
    """

    input_dim: int
    n_layers: int = 4

    @nn.compact
    def __call__(self, inputs: Array) -> Array:
        x0 = inputs
        xl = inputs
        for i in range(self.n_layers):
            xl = x0 * nn.Dense(self.input_dim, name=f"cross_{i}")(xl) + xl
        return xl


class _FactoryWrap(nn.Module):
    """Instantiate a submodule from a factory inside a compact scope, so the
    module class itself can be lifted by nn.vmap. `train` is positional —
    nn.vmap drops kwargs silently."""

    factory: Callable[[], nn.Module] = None

    @nn.compact
    def __call__(self, inputs, train=False):
        return self.factory()(inputs, train=train)


def _vmap_replicas(factory: Callable[[], nn.Module], n: int) -> nn.Module:
    """N independent replicas of a module, stacked on parameter axis 0 and
    applied to the same input with outputs stacked on axis 1 — one batched
    matmul on the MXU instead of a Python loop of per-replica matmuls."""
    Vmapped = nn.vmap(
        _FactoryWrap,
        in_axes=(None, None),
        out_axes=1,
        axis_size=n,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
    )
    return Vmapped(factory=factory)


class MultiExperts(nn.Module):
    """N identical experts over the same input -> [B, n_experts, H]."""

    n_experts: int
    expert_module: Callable[[], nn.Module] = None  # factory returning a fresh expert

    @nn.compact
    def __call__(self, inputs: Array, train: bool = False) -> Array:
        return _vmap_replicas(self.expert_module, self.n_experts)(inputs, train)


class MultiSENet(nn.Module):
    """Per-task SENet gates -> [B, n_tasks, D] (parity: feature_interaction.py:62-71)."""

    n_tasks: int
    senet_module: Callable[[], nn.Module] = None

    @nn.compact
    def __call__(self, inputs: Array, train: bool = False) -> Array:
        return _vmap_replicas(self.senet_module, self.n_tasks)(inputs, train)
