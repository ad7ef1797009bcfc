"""Ranking models (parity: Nexus/training/reranker/recommendation/
modeling.py:37-500).

Architecture (same dataflow as the reference BaseRanker.compute_score):
    embedding_layer (stacked per-feature) -> per-sequence encoder
    (avg / DIN target attention, padding mask = fiid==0) ->
    feature_interaction_layer -> prediction_layer -> score

Everything-is-a-module: subclasses override the `sequence_encode`,
`interaction`, and `prediction` hooks of the linen net. The Python wrapper
(`BaseRanker`) provides loss/eval/predict and the model.msgpack +
model_config.json checkpoint schema.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.modules.aggregate import AverageAggregator
from nexus_tpu.modules.embedding import MultiFeatEmbedding
from nexus_tpu.modules.feature_interaction import CrossNetwork, MultiExperts
from nexus_tpu.modules.layers import MLPModule
from nexus_tpu.modules.loss import BCEWithLogitLoss
from nexus_tpu.modules.metrics import get_ranker_metrics
from nexus_tpu.training.model_base import RecModelBase
from nexus_tpu.training.reranker.recommendation.arguments import ModelArguments
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


class BaseRankerNet(nn.Module):
    """Shared ranker dataflow; subclasses override the three hooks."""

    data_attr: object
    config: ModelArguments
    n_tasks: int = 1

    @property
    def num_feat(self) -> int:
        d = self.data_attr
        n_seq = sum(len(f) for f in (d.seq_features or {}).values())
        return n_seq + len(d.context_features) + len(d.item_features)

    # ---- hooks ----------------------------------------------------------

    def sequence_encode(self, seq_name, seq_emb, padding_mask, target, train):
        """[B, L, F, D] -> [B, F, D]; default masked average."""
        b, l, f, d = seq_emb.shape
        flat = seq_emb.reshape(b, l, f * d)
        agg = AverageAggregator(name=f"seq_{seq_name}")(flat, padding_mask)
        return agg.reshape(b, f, d)

    def interaction(self, x: Array, train: bool) -> Array:
        raise NotImplementedError

    def prediction(self, x: Array, train: bool) -> Array:
        raise NotImplementedError

    # ---- forward ---------------------------------------------------------

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> Array:
        d = self.data_attr
        emb = MultiFeatEmbedding.from_stats(
            features=tuple(d.stats.columns),
            stats=d.stats,
            embedding_dim=self.config.embedding_dim,
            concat_embeddings=False,
            stack_embeddings=True,
            name="embedding_layer",
        )
        context_feat = {k: batch[k] for k in d.context_features if k in batch}
        item_feat = {k: batch[k] for k in d.item_features if k in batch}
        context_emb = emb(context_feat, strict=False)  # [B, N2, D]
        item_emb = emb(item_feat, strict=False)  # [B, N3, D]
        all_embs = []
        for seq_name in sorted(d.seq_features or {}):
            seq_feat = batch[seq_name]
            padding_mask = seq_feat[d.fiid] == 0
            seq_emb = emb(seq_feat, strict=False)  # [B, L, F, D]
            all_embs.append(
                self.sequence_encode(seq_name, seq_emb, padding_mask, item_emb, train)
            )
        all_embs += [context_emb, item_emb]
        x = jnp.concatenate(all_embs, axis=1)  # [B, N, D]
        x = self.interaction(x, train)
        score = self.prediction(x, train)
        if score.ndim == 2 and score.shape[-1] == 1:
            score = score.reshape(-1)
        return score


class MLPRankerNet(BaseRankerNet):
    """Flatten -> MLP -> linear head (parity: MLPRanker, modeling.py:260+)."""

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
        return nn.Dense(1, use_bias=False, name="pred")(x)


class DCNv2RankerNet(BaseRankerNet):
    """Deep & Cross v2, parallel or stacked combination
    (parity: DCNv2Ranker, modeling.py:375-420)."""

    def interaction(self, x, train):
        c = self.config
        flat = x.reshape(x.shape[0], -1)
        in_dim = self.num_feat * c.embedding_dim
        cross = CrossNetwork(input_dim=in_dim, n_layers=c.cross_net_layers, name="cross_net")
        deep = MLPModule(
            mlp_layers=[in_dim] + list(c.mlp_layers),
            activation_func=c.activation,
            dropout=c.dropout,
            batch_norm=c.batch_norm,
            last_activation=True,
            last_bn=True,
            name="deep_net",
        )
        if c.deep_cross_combination == "stacked":
            return deep(cross(flat), train=train)
        return jnp.concatenate([cross(flat), deep(flat, train=train)], axis=-1)

    def prediction(self, x, train):
        return nn.Dense(1, use_bias=False, name="pred")(x)


class MMoERankerNet(BaseRankerNet):
    """Multi-gate mixture-of-experts multi-task ranker
    (parity: MMoERanker, modeling.py:421-500). Experts are vmapped into one
    batched matmul; gates stack into [B, T, E] and route with an einsum."""

    def interaction(self, x, train):
        c = self.config
        flat = x.reshape(x.shape[0], -1)
        in_dim = self.num_feat * c.embedding_dim
        experts = MultiExperts(
            n_experts=c.n_experts,
            expert_module=lambda: MLPModule(
                mlp_layers=[in_dim] + list(c.mlp_layers),
                activation_func=c.activation,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                last_activation=True,
                last_bn=False,
            ),
            name="experts",
        )(flat, train=train)  # [B, E, H]
        gate_layers = [in_dim] + list(c.gate_layers or []) + [c.n_experts]
        gates = []
        for t in range(self.n_tasks):
            g = MLPModule(
                mlp_layers=gate_layers,
                activation_func=c.activation,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                last_activation=False,
                last_bn=False,
                name=f"gate_{t}",
            )(flat, train=train)
            gates.append(jax.nn.softmax(g, axis=-1))
        gate = jnp.stack(gates, axis=1)  # [B, T, E]
        return jnp.einsum("bte,beh->bth", gate, experts)  # [B, T, H]

    def prediction(self, x, train):
        c = self.config
        tower_layers = [list(c.mlp_layers)[-1]] + list(c.tower_layers or []) + [1]
        outs = []
        for t in range(self.n_tasks):
            h = MLPModule(
                mlp_layers=tower_layers,
                activation_func=c.activation,
                dropout=c.dropout,
                batch_norm=c.batch_norm,
                last_activation=False,
                last_bn=False,
                name=f"tower_{t}",
            )(x[:, t], train=train)
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)  # [B, T]


# --------------------------------------------------------------------------
# wrappers
# --------------------------------------------------------------------------

class BaseRanker(RecModelBase):
    model_type = "ranker"
    net_cls = None

    def __init__(self, data_config, model_config):
        self.flabel = self.set_labels_from(data_config)
        super().__init__(data_config, model_config)
        self.loss_function = self.get_loss_function()

    def set_labels_from(self, data_config):
        return data_config.flabels[0]

    @classmethod
    def config_cls(cls):
        return ModelArguments

    def get_loss_function(self):
        return BCEWithLogitLoss()

    @property
    def n_tasks(self) -> int:
        return 1 if isinstance(self.flabel, str) else len(self.flabel)

    def build_net(self):
        return self.net_cls(data_attr=self.data_config, config=self.model_config, n_tasks=self.n_tasks)

    # -- trainer protocol --------------------------------------------------

    def loss_fn(self, variables, batch, rng) -> Tuple[Array, dict]:
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        out = self.net.apply(
            variables, batch, train=True, rngs={"dropout": rng}, mutable=mutable
        )
        scores, updates = out if mutable else (out, {})
        label = self.stack_labels(batch, self.flabel)
        loss = self.loss_function(label, scores)
        return loss, {"batch_stats": updates.get("batch_stats")}

    def eval_step(self, variables, batch) -> Tuple[Array, Array]:
        scores = self.net.apply(variables, batch, train=False)
        label = self.stack_labels(batch, self.flabel)
        return scores, label

    def eval_context(self, variables) -> dict:
        return {}

    def compute_metrics(self, preds: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
        metrics = get_ranker_metrics(list(getattr(self.model_config, "metrics", None) or ["auc", "logloss"]))
        out = {}
        if preds.ndim == 1:
            for name, fn in metrics:
                out[name] = float(fn(jnp.asarray(preds), jnp.asarray(targets)))
        else:  # multi-task: per-label + mean (reference evaluator behavior)
            labels = self.flabel if not isinstance(self.flabel, str) else [self.flabel]
            for name, fn in metrics:
                vals = [
                    float(fn(jnp.asarray(preds[:, t]), jnp.asarray(targets[:, t])))
                    for t in range(preds.shape[1])
                ]
                for t, lbl in enumerate(labels):
                    out[f"{name}_{lbl}"] = vals[t]
                out[name] = float(np.mean(vals))
        return out

    # -- serving-style prediction -----------------------------------------

    def predict(self, variables, context_input: dict, candidates: dict, topk=None):
        """Score each candidate under each context, return top-k offsets
        (parity: modeling.py:155-191)."""
        fiid = self.data_config.fiid
        num_cand = candidates[fiid].shape[1]
        bsz = candidates[fiid].shape[0]

        def expand(v):
            v = jnp.asarray(v)
            return jnp.broadcast_to(v[:, None, ...], (bsz, num_cand, *v.shape[1:])).reshape(
                bsz * num_cand, *v.shape[1:]
            )

        flat_ctx = {}
        for k, v in context_input.items():
            flat_ctx[k] = {k2: expand(v2) for k2, v2 in v.items()} if isinstance(v, dict) else expand(v)
        for k, v in candidates.items():
            flat_ctx[k] = jnp.asarray(v).reshape(bsz * num_cand, *jnp.asarray(v).shape[2:])
        scores = self.net.apply(variables, flat_ctx, train=False)
        if scores.ndim > 1:  # multi-task: first task drives ranking
            scores = scores[:, 0]
        scores = scores.reshape(bsz, num_cand)
        k = min(topk or self.model_config.topk, num_cand)
        _, idx = jax.lax.top_k(scores, k)
        return idx


@register_model()
class MLPRanker(BaseRanker):
    net_cls = MLPRankerNet


@register_model()
class DCNv2Ranker(BaseRanker):
    net_cls = DCNv2RankerNet


@register_model()
class MMoERanker(BaseRanker):
    net_cls = MMoERankerNet

    def set_labels_from(self, data_config):
        return list(data_config.flabels)
