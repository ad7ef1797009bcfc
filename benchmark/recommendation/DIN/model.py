"""DIN ranker assembled from nexus_tpu modules (parity:
/root/reference/benchmark/recommendation/DIN/model.py:26-121 — a custom
model subclass composed outside the core library, the everything-is-a-module
extension pattern)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax.numpy as jnp

from nexus_tpu.modules.aggregate import DeepInterestAggregator
from nexus_tpu.modules.layers import MLPModule
from nexus_tpu.training.reranker.recommendation.modeling import BaseRanker, BaseRankerNet
from nexus_tpu.utils.registry import register_model


class DINRankerNet(BaseRankerNet):
    """Target-attention sequence encoding (DIN) + MLP head."""

    def sequence_encode(self, seq_name, seq_emb, padding_mask, target, train):
        b, l, f, d = seq_emb.shape
        flat = seq_emb.reshape(b, l, f * d)
        target_flat = target.reshape(b, -1)  # [B, N3*D]
        agg = DeepInterestAggregator(
            input_dim=f * d, hidden_size=self.config.din_hidden_size, name=f"din_{seq_name}"
        )(flat, padding_mask, target_flat)
        return agg.reshape(b, f, d)

    def interaction(self, x, train):
        c = self.config
        flat = x.reshape(x.shape[0], -1)
        return MLPModule(
            mlp_layers=[self.num_feat * c.embedding_dim] + list(c.mlp_layers),
            activation_func=c.activation,
            dropout=c.dropout,
            batch_norm=c.batch_norm,
            last_activation=True,
            name="deep_net",
        )(flat, train=train)

    def prediction(self, x, train):
        import flax.linen as nn

        return nn.Dense(1, use_bias=False, name="pred")(x)


@register_model()
class DINRanker(BaseRanker):
    net_cls = DINRankerNet
