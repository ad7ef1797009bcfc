"""Behavior-sequence aggregators (parity: Nexus/modules/aggregate.py:14-137).

All aggregators map ([B, L, D], padding_mask [B, L]) -> [B, D] with
`padding_mask` True at PAD positions (reference convention). Static shapes,
mask-based — no dynamic lengths, so everything fuses under jit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from nexus_tpu.modules.layers import ActivationUnit

Array = jnp.ndarray


class AverageAggregator(nn.Module):
    """Mean over the sequence axis; masked mean when a padding mask is given."""

    axis: int = 1

    def __call__(self, seq: Array, padding_mask: Optional[Array] = None, **kw) -> Array:
        if padding_mask is None:
            return jnp.mean(seq, axis=self.axis)
        valid = (~padding_mask).astype(seq.dtype)[..., None]
        total = jnp.sum(seq * valid, axis=self.axis)
        count = jnp.maximum(jnp.sum(valid, axis=self.axis), 1.0)
        return total / count


class LastItemAggregator(nn.Module):
    """Representation of the last non-padded item (parity: aggregate.py:35-62)."""

    axis: int = 1

    def __call__(self, seq: Array, padding_mask: Array, **kw) -> Array:
        lengths = jnp.sum(~padding_mask, axis=-1)
        last_idx = jnp.maximum(lengths - 1, 0)  # [B]
        return jnp.take_along_axis(seq, last_idx[:, None, None], axis=self.axis).squeeze(self.axis)


class TransformerEncoderBlock(nn.Module):
    """Post-norm transformer encoder layer (torch.nn.TransformerEncoderLayer
    semantics: MHA -> add&norm -> FFN -> add&norm)."""

    d_model: int
    n_heads: int
    hidden_size: int
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array, padding_mask: Optional[Array] = None, train: bool = False) -> Array:
        attn_mask = None
        if padding_mask is not None:
            # [B, 1, 1, L]: queries may attend only to non-pad keys
            attn_mask = (~padding_mask)[:, None, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        from nexus_tpu.modules.activations import get_activation

        h = nn.Dense(self.hidden_size)(x)
        h = get_activation(self.activation)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model)(h)
        return nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(h))


class SelfAttentiveAggregator(nn.Module):
    """Transformer over the behavior sequence + last-item readout
    (parity: aggregate.py:67-114)."""

    input_dim: int
    max_seq_len: int
    n_layers: int = 1
    n_heads: int = 4
    hidden_size: int = 512
    dropout: float = 0.3
    activation: str = "relu"

    @nn.compact
    def __call__(self, seq: Array, padding_mask: Array, train: bool = False, **kw) -> Array:
        positions = jnp.arange(seq.shape[1])[None, :]
        pos_emb = nn.Embed(self.max_seq_len, self.input_dim, name="position_embedding")(positions)
        x = seq + pos_emb
        for i in range(self.n_layers):
            x = TransformerEncoderBlock(
                d_model=self.input_dim,
                n_heads=self.n_heads,
                hidden_size=self.hidden_size,
                dropout=self.dropout,
                activation=self.activation,
                name=f"layer_{i}",
            )(x, padding_mask=padding_mask, train=train)
        return LastItemAggregator()(x, padding_mask)


class DeepInterestAggregator(nn.Module):
    """DIN target attention: weights = ActivationUnit(target, seq), padded
    positions zeroed, weighted sum over time (parity: aggregate.py:117-137)."""

    input_dim: int
    hidden_size: int = 512

    @nn.compact
    def __call__(self, seq: Array, padding_mask: Array, target: Array, **kw) -> Array:
        weights = ActivationUnit(hidden_size=self.hidden_size)(query=target, keys=seq)  # [B, L, 1]
        weights = jnp.where(padding_mask[..., None], 0.0, weights)
        return jnp.sum(seq * weights, axis=1)


_AGGREGATORS = {
    "average": AverageAggregator,
    "mean": AverageAggregator,
    "last_item": LastItemAggregator,
    "self_attentive": SelfAttentiveAggregator,
    "deep_interest": DeepInterestAggregator,
    "din": DeepInterestAggregator,
}


def get_seq_aggregator(name: str, **kwargs) -> nn.Module:
    key = name.lower().replace("aggregator", "").strip("_")
    if key not in _AGGREGATORS:
        raise ValueError(f"unknown aggregator {name!r}; known: {sorted(_AGGREGATORS)}")
    return _AGGREGATORS[key](**kwargs)
