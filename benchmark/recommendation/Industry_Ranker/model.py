"""Industry composite ranker: DIN target-attention sequence encoding +
MMoE multi-task interaction + per-task deep-cross (DCNv2) towers (parity:
/root/reference/benchmark/recommendation/Industry_Ranker/model.py:26-160 —
the everything-is-a-module composition exercise over the library's blocks)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from nexus_tpu.modules.aggregate import DeepInterestAggregator
from nexus_tpu.modules.feature_interaction import CrossNetwork, MultiExperts
from nexus_tpu.modules.layers import MLPModule
from nexus_tpu.training.reranker.recommendation.modeling import BaseRanker, BaseRankerNet
from nexus_tpu.utils.registry import register_model


class MMoEDINDCNv2RankerNet(BaseRankerNet):
    def sequence_encode(self, seq_name, seq_emb, padding_mask, target, train):
        b, l, f, d = seq_emb.shape
        agg = DeepInterestAggregator(
            input_dim=f * d,
            hidden_size=getattr(self.config, "din_hidden_size", 36),
            name=f"din_{seq_name}",
        )(seq_emb.reshape(b, l, f * d), padding_mask, target.reshape(b, -1))
        return agg.reshape(b, f, d)

    def interaction(self, x, train):
        c = self.config
        flat = x.reshape(x.shape[0], -1)
        in_dim = self.num_feat * c.embedding_dim
        experts = MultiExperts(
            n_experts=c.n_experts,
            expert_module=lambda: MLPModule(
                mlp_layers=[in_dim] + list(c.mlp_layers),
                activation_func=c.activation, dropout=c.dropout,
                batch_norm=c.batch_norm, last_activation=True, last_bn=False,
            ),
            name="experts",
        )(flat, train=train)  # [B, E, H]
        gates = []
        for t in range(self.n_tasks):
            g = MLPModule(
                mlp_layers=[in_dim] + list(c.gate_layers or []) + [c.n_experts],
                activation_func=c.activation, dropout=c.dropout,
                batch_norm=c.batch_norm, last_activation=False, last_bn=False,
                name=f"gate_{t}",
            )(flat, train=train)
            gates.append(jax.nn.softmax(g, axis=-1))
        gate = jnp.stack(gates, axis=1)  # [B, T, E]
        return jnp.einsum("bte,beh->bth", gate, experts)

    def prediction(self, x, train):
        c = self.config
        h = list(c.mlp_layers)[-1]
        outs = []
        for t in range(self.n_tasks):
            xt = x[:, t]
            cross = CrossNetwork(input_dim=h, n_layers=c.cross_net_layers,
                                 name=f"cross_{t}")(xt)
            deep = MLPModule(
                mlp_layers=[h] + list(c.tower_layers or [h]),
                activation_func=c.activation, dropout=c.dropout,
                batch_norm=c.batch_norm, last_activation=True, last_bn=False,
                name=f"deep_{t}",
            )(xt, train=train)
            if c.deep_cross_combination == "stacked":
                combined = deep
            else:
                combined = jnp.concatenate([cross, deep], axis=-1)
            outs.append(nn.Dense(1, use_bias=False, name=f"head_{t}")(combined))
        return jnp.concatenate(outs, axis=-1)  # [B, T]


@register_model()
class MMoEDINDCNv2Ranker(BaseRanker):
    net_cls = MMoEDINDCNv2RankerNet

    def set_labels_from(self, data_config):
        return list(data_config.flabels)
