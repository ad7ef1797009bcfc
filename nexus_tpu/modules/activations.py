"""Activation functions (parity: Nexus/modules/activations.py:8-56)."""

from __future__ import annotations

from typing import Callable, Union

import flax.linen as nn
import jax.numpy as jnp


class Dice(nn.Module):
    """Data-adaptive activation for CTR models (DIN paper).

    p(x) = sigmoid((x - mean) / sqrt(var + eps)); out = p*x + (1-p)*alpha*x,
    with a learned per-feature alpha. Statistics are computed over the batch
    axis at call time (training-mode behavior of the reference's BatchNorm
    formulation) — fully fused by XLA, no running stats needed for ranking
    model parity.
    """

    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        x_norm = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        p = nn.sigmoid(x_norm)
        return p * x + (1.0 - p) * alpha * x


_ACTIVATIONS: dict = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
    "softmax": nn.softmax,
    "leakyrelu": nn.leaky_relu,
    "leaky_relu": nn.leaky_relu,
    "elu": nn.elu,
    "silu": nn.silu,
    "swish": nn.silu,
    "mish": lambda x: x * nn.tanh(nn.softplus(x)),
    "softplus": nn.softplus,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_activation(name: Union[str, Callable, None], dim: int | None = None):
    """Resolve an activation by name. ``dice`` returns a linen Module instance
    (it has parameters); everything else returns a plain function."""
    if name is None:
        return lambda x: x
    if callable(name):
        return name
    key = name.lower()
    if key == "dice":
        return Dice()
    if key not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)} + ['dice']")
    return _ACTIVATIONS[key]
