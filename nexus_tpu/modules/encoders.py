"""Query/item encoders for recommendation models
(parity: Nexus/modules/{item_encoder,query_encoder}.py).

Each encoder takes the flat feature batch dict and produces dense vectors.
Sequence features arrive as nested dicts {seq_name: {feat: [B, L]}}.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from nexus_tpu.modules.aggregate import AverageAggregator, SelfAttentiveAggregator
from nexus_tpu.modules.embedding import MultiFeatEmbedding
from nexus_tpu.modules.layers import MLPModule

Array = jnp.ndarray


def get_seq_data(batch: dict, seq_name: Optional[str] = None) -> dict:
    """Fetch a sequence sub-dict from a batch (parity: modules/arguments.py:127)."""
    if seq_name is not None:
        return batch[seq_name]
    return batch.get("seq", {})


class MLPItemEncoder(nn.Module):
    """MultiFeatEmbedding(item feats) -> MLP (parity: item_encoder.py:40-68)."""

    data_attr: object  # DataAttr4Model
    embedding_dim: int
    mlp_layers: tuple
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False) -> Array:
        emb = MultiFeatEmbedding.from_stats(
            features=self.data_attr.item_features,
            stats=self.data_attr.stats,
            embedding_dim=self.embedding_dim,
            concat_embeddings=True,
            name="item_embedding",
        )
        x = emb(batch, strict=False)
        return MLPModule(
            mlp_layers=[emb.total_embedding_dim] + list(self.mlp_layers),
            activation_func=self.activation,
            dropout=self.dropout,
            batch_norm=self.batch_norm,
            last_activation=False,
            last_bn=False,
            name="mlp",
        )(x, train=train)


class MLPQueryEncoder(nn.Module):
    """MultiFeatEmbedding(context feats) -> MLP (parity: query_encoder.py:146-178)."""

    data_attr: object
    embedding_dim: int
    mlp_layers: tuple
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False) -> Array:
        emb = MultiFeatEmbedding.from_stats(
            features=self.data_attr.context_features,
            stats=self.data_attr.stats,
            embedding_dim=self.embedding_dim,
            concat_embeddings=True,
            name="context_embedding",
        )
        x = emb(batch, strict=False)
        return MLPModule(
            mlp_layers=[emb.total_embedding_dim] + list(self.mlp_layers),
            activation_func=self.activation,
            dropout=self.dropout,
            batch_norm=self.batch_norm,
            last_activation=False,
            last_bn=False,
            name="mlp",
        )(x, train=train)


class BaseQueryEncoderWithSeq(nn.Module):
    """Encode each behavior sequence through the shared item encoder, aggregate,
    then concat with the context embedding (parity: query_encoder.py:31-58)."""

    data_attr: object
    embedding_dim: int
    item_encoder: nn.Module = None

    def aggregate(self, seq_name: str, seq_emb: Array, padding_mask: Array, train: bool) -> Array:
        return AverageAggregator(name=f"agg_{seq_name}")(seq_emb, padding_mask)

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False) -> Array:
        seq_embs = []
        for seq_name in sorted(self.data_attr.seq_lengths or {}):
            seq_data = get_seq_data(batch, seq_name)
            seq_emb = self.item_encoder(seq_data, train=train)  # [B, L, D]
            first_feat = next(iter(seq_data))
            padding_mask = seq_data[first_feat] == 0
            seq_embs.append(self.aggregate(seq_name, seq_emb, padding_mask, train))
        context_emb = MultiFeatEmbedding.from_stats(
            features=self.data_attr.context_features,
            stats=self.data_attr.stats,
            embedding_dim=self.embedding_dim,
            concat_embeddings=True,
            name="context_embedding",
        )(batch, strict=False)
        return jnp.concatenate(seq_embs + [context_emb], axis=-1)


class SASRecEncoder(BaseQueryEncoderWithSeq):
    """Self-attentive (SASRec-style) behavior-sequence query encoder
    (parity: query_encoder.py:62-110)."""

    n_layers: int = 1
    n_heads: int = 4
    hidden_size: int = 512
    dropout: float = 0.3
    activation: str = "relu"
    seq_item_dim: int = None  # dim of item encoder output; defaults to mlp output

    def aggregate(self, seq_name: str, seq_emb: Array, padding_mask: Array, train: bool) -> Array:
        return SelfAttentiveAggregator(
            input_dim=self.seq_item_dim or seq_emb.shape[-1],
            max_seq_len=self.data_attr.seq_lengths[seq_name],
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            hidden_size=self.hidden_size,
            dropout=self.dropout,
            activation=self.activation,
            name=f"agg_{seq_name}",
        )(seq_emb, padding_mask, train=train)
