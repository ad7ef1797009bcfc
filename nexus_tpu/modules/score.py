"""Similarity scorers (parity: Nexus/modules/score.py:15-137).

Shape convention (same as the reference):
  (query, items) in {([B,D],[B,D]), ([B,D],[B,N,D]), ([B,D],[N,D]),
                     ([B,L,D],[B,L,D]), ([B,L,D],[B,L,N,D])}

Parameter-free scorers are plain callables; scorers with weights (GMF,
FusionMFMLP) are flax linen modules. All shape dispatch happens on static
shapes at trace time, so every branch is jit-safe.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from nexus_tpu.modules.activations import get_activation

Array = jnp.ndarray


@dataclass(frozen=True)
class InnerProductScorer:
    def __call__(self, query: Array, items: Array) -> Array:
        if query.shape[0] == items.shape[0]:
            if query.ndim < items.ndim:  # [B,D] x [B,N,D] -> [B,N]
                return jnp.einsum("...d,...nd->...n", query, items)
            return jnp.sum(query * items, axis=-1)  # elementwise
        return query @ items.T  # [B,D] x [N,D] -> [B,N]


@dataclass(frozen=True)
class CosineScorer(InnerProductScorer):
    eps: float = 1e-12

    def __call__(self, query: Array, items: Array) -> Array:
        out = InnerProductScorer.__call__(self, query, items)
        item_norm = jnp.linalg.norm(items, axis=-1)
        keepdim = query.ndim != items.ndim or query.shape[0] != items.shape[0]
        q_norm = jnp.linalg.norm(query, axis=-1, keepdims=keepdim)
        return out / jnp.maximum(item_norm, self.eps) / jnp.maximum(q_norm, self.eps)


@dataclass(frozen=True)
class IPTextRetrievalScorer:
    """q_reps @ p_reps^T over the last two axes (parity: score.py:37-50)."""

    def __call__(self, q_reps: Array, p_reps: Array) -> Array:
        if p_reps.ndim == 2:
            return q_reps @ p_reps.T
        return jnp.matmul(q_reps, jnp.swapaxes(p_reps, -2, -1))


@dataclass(frozen=True)
class EuclideanScorer(InnerProductScorer):
    """Negative squared euclidean distance."""

    def __call__(self, query: Array, items: Array) -> Array:
        ip = InnerProductScorer.__call__(self, query, items)
        keepdim = query.ndim != items.ndim or query.shape[0] != items.shape[0]
        sq_i = jnp.sum(items * items, axis=-1)
        sq_q = jnp.sum(query * query, axis=-1, keepdims=keepdim)
        return -(sq_i + sq_q - 2.0 * ip)


@dataclass(frozen=True)
class NormScorer(InnerProductScorer):
    p: int = 2

    def __call__(self, query: Array, items: Array) -> Array:
        if query.ndim < items.ndim or query.shape[0] != items.shape[0]:
            query = query[..., None, :]
        diff = query - items
        if self.p == 2:
            return -jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
        return -jnp.sum(jnp.abs(diff) ** self.p, axis=-1) ** (1.0 / self.p)


class MLPScorer:
    """Concat(query, items) -> transform -> squeeze. ``transform`` is any
    callable mapping [..., 2D] -> [..., 1] (e.g. a bound MLPModule apply)."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, query: Array, items: Array) -> Array:
        if query.shape[0] == items.shape[0]:
            if query.ndim < items.ndim:
                q = jnp.broadcast_to(query[..., None, :], items.shape)
            else:
                q = query
            inp = jnp.concatenate([q, items], axis=-1)
        else:
            q = jnp.broadcast_to(query[:, None, :], (query.shape[0], items.shape[0], query.shape[-1]))
            i = jnp.broadcast_to(items[None], (query.shape[0], *items.shape))
            inp = jnp.concatenate([q, i], axis=-1)
        return jnp.squeeze(self.transform(inp), axis=-1)


class GMFScorer(nn.Module):
    """Generalized matrix factorization scorer (parity: score.py:98-115)."""

    emb_dim: int
    use_bias: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, query: Array, key: Array) -> Array:
        if query.ndim < key.ndim:
            query = query[:, None, :]
        elif query.shape[0] != key.shape[0]:
            query = jnp.broadcast_to(query[:, None, :], (query.shape[0], key.shape[0], query.shape[-1]))
            key = jnp.broadcast_to(key[None], (query.shape[0], *key.shape))
        h = query * key
        out = nn.Dense(1, use_bias=self.use_bias, name="W")(h)
        return jnp.squeeze(get_activation(self.activation)(out), axis=-1)


class FusionMFMLPScorer(nn.Module):
    """MF branch ⊕ MLP branch -> linear -> activation (parity: score.py:117-137)."""

    emb_dim: int
    hidden_size: int
    mlp_layers: tuple = (128,)
    use_bias: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, query: Array, key: Array) -> Array:
        from nexus_tpu.modules.layers import MLPModule

        if query.ndim < key.ndim:
            query = jnp.broadcast_to(query[:, None, :], key.shape)
        elif query.shape[0] != key.shape[0]:
            query = jnp.broadcast_to(query[:, None, :], (query.shape[0], key.shape[0], query.shape[-1]))
            key = jnp.broadcast_to(key[None], (query.shape[0], *key.shape))
        h_mf = query * key
        h_mlp = MLPModule(list(self.mlp_layers) + [self.hidden_size], activation_func="relu")(
            jnp.concatenate([query, key], axis=-1)
        )
        fused = nn.Dense(1, use_bias=False, name="W")(jnp.concatenate([h_mf, h_mlp], axis=-1))
        return get_activation(self.activation)(jnp.squeeze(fused, axis=-1))


_SCORERS = {
    "inner_product": InnerProductScorer,
    "ip": InnerProductScorer,
    "cosine": CosineScorer,
    "euclidean": EuclideanScorer,
    "norm": NormScorer,
    "ip_text_retrieval": IPTextRetrievalScorer,
}


def get_scorer(name: str, **kwargs):
    key = name.lower().replace("scorer", "").strip("_")
    if key not in _SCORERS:
        raise ValueError(f"unknown scorer {name!r}; known: {sorted(_SCORERS)}")
    return _SCORERS[key](**kwargs)
