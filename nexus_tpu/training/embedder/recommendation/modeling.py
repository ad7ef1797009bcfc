"""Two-tower retrieval models (parity: Nexus/training/embedder/recommendation/
modeling.py:44-436).

Dataflow per reference BaseRetriever.compute_score: query tower + item tower,
sampled negatives (uniform/masked/popular/MIDX/cluster/LSH) with proposal
log-prob corrections, pluggable scorer + loss. TPU redesign notes:

- negative item FEATURES come from a dense on-device id-indexed table
  ([num_items, ...] per feature) so `sampled ids -> features -> item tower`
  is one gather + one batched forward, replacing the reference's host-side
  `item_dataset[item_id]` lookup (modeling.py:238-249);
- `eval_step` replaces the per-batch Faiss GPU index (modeling.py:176-207)
  with the streaming brute-force top-k kernel in nexus_tpu.ops;
- sampling runs INSIDE the pjit'd loss on stop-gradient query vectors with a
  linen 'sampling' RNG stream.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.modules.embedding import MultiFeatEmbedding
from nexus_tpu.modules.encoders import MLPItemEncoder, MLPQueryEncoder
from nexus_tpu.modules.layers import MLPModule
from nexus_tpu.modules.loss import (
    BinaryCrossEntropyLoss,
    BPRLoss,
    InBatchSoftmaxLoss,
    get_loss,
)
from nexus_tpu.modules.metrics import get_retriever_metrics
from nexus_tpu.modules.sampler import MaskedUniformSampler, UniformSampler, get_sampler
from nexus_tpu.modules.score import CosineScorer, InnerProductScorer
from nexus_tpu.ops.topk import brute_force_topk
from nexus_tpu.training.embedder.recommendation.arguments import ModelArguments
from nexus_tpu.training.model_base import RecModelBase
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


class TwoTowerBase(nn.Module):
    """Common two-tower protocol: encode_query/encode_item + a sampling-aware
    training forward usable as an apply `method`."""

    def __call__(self, batch, train: bool = False):
        return self.encode_query(batch, train), self.encode_item(batch, train)

    def encode_query(self, batch, train: bool = False) -> Array:
        raise NotImplementedError

    def encode_item(self, batch, train: bool = False) -> Array:
        raise NotImplementedError

    def train_forward(
        self, batch, sampler, num_neg: int, item_feat_table: Dict[str, Array],
        fiid: str, user_hist: Optional[Array] = None,
    ):
        # Id convention: sampled neg_ids are RAW item ids, which are also
        # the rows of item_feat_table (built dense[id] = features); id 0 is
        # the padding item. Samplers must emit ids < num_items.
        q = self.encode_query(batch, train=True)
        pos_vec = self.encode_item(batch, train=True)
        log_pos_prob = neg_ids = log_neg_prob = neg_vec = None
        if sampler is not None:
            key = self.make_rng("sampling")
            pos_ids = batch[fiid]
            sample_q = jax.lax.stop_gradient(q)
            if isinstance(sampler, MaskedUniformSampler):
                log_pos_prob, neg_ids, log_neg_prob = sampler(
                    key, sample_q, num_neg, pos_items=pos_ids, user_hist=user_hist
                )
            else:
                log_pos_prob, neg_ids, log_neg_prob = sampler(
                    key, sample_q, num_neg, pos_items=pos_ids
                )
            neg_feats = {k: v[neg_ids] for k, v in item_feat_table.items()}
            neg_vec = self.encode_item(neg_feats, train=True)
        return q, pos_vec, neg_vec, log_pos_prob, log_neg_prob, neg_ids


class TwoTowerNet(TwoTowerBase):
    """Two independent towers (MLP retrievers)."""

    query_encoder: nn.Module = None
    item_encoder: nn.Module = None

    def encode_query(self, batch, train: bool = False) -> Array:
        return self.query_encoder(batch, train=train)

    def encode_item(self, batch, train: bool = False) -> Array:
        return self.item_encoder(batch, train=train)


class SASRecNet(TwoTowerBase):
    """SASRec two-tower net with a SHARED item embedding between the behavior
    sequence encoding and the item tower (the reference shares
    self.item_encoder across towers — modeling.py:382-416)."""

    data_attr: object = None
    config: ModelArguments = None

    def setup(self):
        c = self.config
        self._item_emb = MultiFeatEmbedding.from_stats(
            features=self.data_attr.item_features,
            stats=self.data_attr.stats,
            embedding_dim=c.embedding_dim,
            concat_embeddings=True,
            name="item_embedding",
        )
        self.item_dim = len(self.data_attr.item_features) * c.embedding_dim
        self._context_emb = MultiFeatEmbedding.from_stats(
            features=self.data_attr.context_features,
            stats=self.data_attr.stats,
            embedding_dim=c.embedding_dim,
            concat_embeddings=True,
            name="context_embedding",
        )
        from nexus_tpu.modules.aggregate import SelfAttentiveAggregator

        self._aggs = {
            seq_name: SelfAttentiveAggregator(
                input_dim=self.item_dim,
                max_seq_len=max_len,
                n_layers=c.n_layers,
                n_heads=c.n_heads,
                hidden_size=c.hidden_size,
                dropout=c.dropout,
                name=f"agg_{seq_name}",
            )
            for seq_name, max_len in sorted((self.data_attr.seq_lengths or {}).items())
        }
        num_seqs = max(len(self._aggs), 1)
        out_dim = self.item_dim * num_seqs + self._context_emb.total_embedding_dim
        self._mlp = MLPModule(
            mlp_layers=[out_dim] + list(c.mlp_layers) + [self.item_dim],
            activation_func=c.activation,
            dropout=c.dropout,
            batch_norm=c.batch_norm,
            last_activation=False,
            last_bn=False,
            name="mlp",
        )

    def encode_item(self, batch, train: bool = False) -> Array:
        return self._item_emb(batch, strict=False)

    def encode_query(self, batch, train: bool = False) -> Array:
        fiid = self.data_attr.fiid
        seq_embs = []
        for seq_name, agg in self._aggs.items():
            seq_data = batch[seq_name]
            seq_emb = self._item_emb(seq_data, strict=False)  # [B, L, item_dim]
            padding_mask = seq_data[fiid] == 0
            seq_embs.append(agg(seq_emb, padding_mask, train=train))
        context_emb = self._context_emb(
            {k: batch[k] for k in self.data_attr.context_features if k in batch}, strict=False
        )
        x = jnp.concatenate(seq_embs + [context_emb], axis=-1)
        return self._mlp(x, train=train)


class BaseRetriever(RecModelBase):
    model_type = "retriever"

    def __init__(self, data_config, model_config, item_loader=None):
        super().__init__(data_config, model_config)
        self.fiid = data_config.fiid
        self.flabel = data_config.flabels[0]
        self.num_items = data_config.num_items
        self.score_function = self.get_score_function()
        self.loss_function = self.get_loss_function()
        self.negative_sampler = self.get_negative_sampler()
        self.item_feat_table: Optional[Dict[str, Array]] = None
        self.item_vectors: Optional[np.ndarray] = None
        self.item_ids: Optional[np.ndarray] = None
        self._item_dataset = None
        if item_loader is not None:
            self.set_item_dataset(item_loader)

    @classmethod
    def config_cls(cls):
        return ModelArguments

    # -- assembly hooks ----------------------------------------------------

    def get_query_encoder(self) -> nn.Module:
        raise NotImplementedError

    def get_item_encoder(self) -> nn.Module:
        raise NotImplementedError

    def get_score_function(self):
        return InnerProductScorer()

    def get_loss_function(self):
        return BPRLoss()

    def get_negative_sampler(self):
        if self.model_config.sampler:
            return self._sampler_from_name(self.model_config.sampler)
        return UniformSampler(num_items=self.data_config.num_items)

    def _sampler_from_name(self, name: str):
        """Build the configured sampler. Popularity variants defer until the
        item dataset attaches (set_item_dataset wires the counts); LSH builds
        from the item-vector dimensionality."""
        kwargs = {"num_items": self.data_config.num_items}
        if "midx" in name or "cluster" in name:
            kwargs["num_clusters"] = self.model_config.num_clusters
        if "pop" in name or name == "lsh":
            self._pending_sampler_name = name
            return None  # completed in set_item_dataset
        return get_sampler(name, **kwargs)

    def _finalize_pending_sampler(self, item_dataset) -> None:
        name = getattr(self, "_pending_sampler_name", None)
        if name is None:
            return
        import numpy as np

        if "pop" in name:
            pop_dict = getattr(item_dataset, "item_pop_dict", None) or {}
            counts = np.zeros(self.num_items, np.float32)
            for iid, c in pop_dict.items():
                if 0 <= int(iid) < self.num_items:
                    counts[int(iid)] = c
            if name == "popular":
                self.negative_sampler = get_sampler("popular", pop_count=counts)
            else:
                self.negative_sampler = get_sampler(
                    name, pop_count=counts, num_clusters=self.model_config.num_clusters
                )
        elif name == "lsh":
            item_dim = len(self.data_config.item_features) * self.model_config.embedding_dim
            if self.model_config.mlp_layers:
                item_dim = list(self.model_config.mlp_layers)[-1]
            self.negative_sampler = get_sampler(
                "lsh", key=jax.random.PRNGKey(0), num_items=self.num_items, n_dims=item_dim
            )
        self._pending_sampler_name = None

    def build_net(self):
        self.item_encoder_module = self.get_item_encoder()
        return TwoTowerNet(
            query_encoder=self.get_query_encoder(), item_encoder=self.item_encoder_module
        )

    # -- item data ---------------------------------------------------------

    def set_item_dataset(self, item_dataset) -> None:
        """Attach the ItemDataset: dense device feature table + popularity
        wiring for IPS in-batch softmax (reference set_item_loader/post_init)."""
        self._item_dataset = item_dataset
        self.item_feat_table = {
            k: jnp.asarray(v) for k, v in item_dataset.item_feature_table().items()
        }
        self._finalize_pending_sampler(item_dataset)
        if isinstance(self.loss_function, InBatchSoftmaxLoss) and hasattr(
            item_dataset, "item_pop_dict"
        ):
            pop = item_dataset.item_pop_dict
            self.loss_function = self.loss_function.with_item_popularity(
                list(pop.keys()), list(pop.values())
            )

    def update_sampler_index(self, key, variables) -> None:
        """Rebuild sampler codebooks (MIDX/cluster/LSH) from current item
        vectors. Call between epochs; requires re-jit of the train step."""
        vecs = self.compute_item_vectors(variables)
        self.negative_sampler = self.negative_sampler.update(key, jnp.asarray(vecs))

    # -- trainer protocol --------------------------------------------------

    def _user_hist(self, batch) -> Optional[Array]:
        seqs = self.data_config.seq_features or {}
        if not seqs:
            return None
        first = sorted(seqs)[0]
        return batch[first][self.fiid]

    def loss_fn(self, variables, batch, rng) -> Tuple[Array, dict]:
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        sampler = self.negative_sampler
        out = self.net.apply(
            variables,
            batch,
            sampler,
            self.model_config.num_neg,
            self.item_feat_table or {},
            self.fiid,
            self._user_hist(batch),
            method="train_forward",
            rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 7)},
            mutable=mutable,
        )
        (q, pos_vec, neg_vec, log_pos_prob, log_neg_prob, neg_ids), updates = (
            out if mutable else (out, {})
        )
        if sampler is None:
            # in-batch softmax regime (DSSMInBatch)
            loss = self.loss_function(
                query_vector=q, pos_item_vector=pos_vec, pos_item_id=batch[self.fiid]
            )
        else:
            pos_score = self.score_function(q, pos_vec)
            neg_score = self.score_function(q, neg_vec)
            loss = self.loss_function(
                pos_score=pos_score,
                neg_score=neg_score,
                log_pos_prob=log_pos_prob,
                log_neg_prob=log_neg_prob,
                label=batch[self.flabel],
                query_vector=q,
                pos_item_vector=pos_vec,
                pos_item_id=batch[self.fiid],
            )
        return loss, {"batch_stats": updates.get("batch_stats")}

    def eval_step(self, variables, batch, item_vectors, k: int) -> Tuple[Array, Array]:
        """Rank the positive item against the whole corpus top-k
        (parity: modeling.py:176-207, Faiss replaced by ops.brute_force_topk)."""
        q = self.net.apply(variables, batch, method="encode_query")
        pos_vec = self.net.apply(variables, batch, method="encode_item")
        if isinstance(self.score_function, CosineScorer):
            item_vectors = item_vectors / jnp.maximum(
                jnp.linalg.norm(item_vectors, axis=-1, keepdims=True), 1e-12
            )
            pos_vec = pos_vec / jnp.maximum(jnp.linalg.norm(pos_vec, axis=-1, keepdims=True), 1e-12)
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        pos_score = jnp.sum(q * pos_vec, axis=-1, keepdims=True)  # [B, 1]
        topk_scores, _ = brute_force_topk(q, item_vectors, k=k)
        all_scores = jnp.concatenate([pos_score, topk_scores], axis=-1)
        order = jnp.argsort(-all_scores, axis=-1, stable=True)
        pred = order[:, :k] == 0  # positive ranked within top-k
        target = jnp.ones((pred.shape[0], 1), bool)
        return pred, target

    def eval_context(self, variables) -> dict:
        vecs = self.compute_item_vectors(variables)
        k = max(self.cutoffs)
        return {"item_vectors": jnp.asarray(vecs), "k": k}

    @property
    def cutoffs(self):
        return list(getattr(self.model_config, "cutoffs", None) or [1, 5, 10])

    def compute_metrics(self, preds: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
        names = list(getattr(self.model_config, "metrics", None) or ["ndcg", "recall"])
        out = {}
        for name, fn in get_retriever_metrics(names):
            for k in self.cutoffs:
                if k <= preds.shape[1]:
                    out[f"{name}@{k}"] = float(fn(jnp.asarray(preds), jnp.asarray(targets), k))
        return out

    # -- item vectors / inference -----------------------------------------

    def compute_item_vectors(self, variables, batch_size: int = 65536) -> np.ndarray:
        """Encode ALL candidate items through the item tower in fixed-size
        device batches (parity: the reference batches via item_loader,
        trainer.py:29-57) — bounded peak memory at industrial item counts;
        corpora <= batch_size still go through in one call."""
        if self.item_feat_table is None:
            raise RuntimeError("no item dataset attached; call set_item_dataset first")
        feats = self.item_feat_table
        n = next(iter(feats.values())).shape[0]
        encode = jax.jit(lambda v, b: self.net.apply(v, b, method="encode_item"))
        if n <= batch_size:
            return np.asarray(encode(variables, feats))
        out = []
        pad = (-n) % batch_size  # one static shape -> one compile
        for off in range(0, n, batch_size):
            chunk = {
                k: jax.lax.dynamic_slice_in_dim(v, min(off, n - batch_size), batch_size)
                if pad and off + batch_size > n
                else v[off : off + batch_size]
                for k, v in feats.items()
            }
            vecs = np.asarray(encode(variables, chunk))
            if off + batch_size > n:  # final overlapped window: keep the tail
                vecs = vecs[-(n - off):]
            out.append(vecs)
        return np.concatenate(out, axis=0)

    def update_item_vectors(self, variables) -> None:
        self.item_vectors = self.compute_item_vectors(variables)
        self.item_ids = np.arange(self.num_items)

    def encode_query(self, variables, context_input: dict) -> Array:
        return self.net.apply(variables, context_input, method="encode_query")

    def predict(self, variables, context_input: dict, candidates: dict, topk: int):
        q = self.encode_query(variables, context_input)
        cand_vec = self.net.apply(variables, candidates, method="encode_item")
        scores = self.score_function(q, cand_vec)
        _, idx = jax.lax.top_k(scores, min(topk, scores.shape[-1]))
        return idx

    def sampling(self, key, query, num_neg, pos_items=None, method="brute"):
        """Retriever-as-sampler (IRGAN RetrieverSampler support): sample
        negatives from softmax over scores against all item vectors."""
        vecs = jnp.asarray(self.item_vectors)
        logits = query @ vecs.T
        neg = jax.random.categorical(key, logits[:, None, :], shape=(query.shape[0], num_neg))
        log_prob = jax.nn.log_softmax(logits, axis=-1)
        neg_prob = jnp.take_along_axis(log_prob, neg, axis=-1)
        if pos_items is not None:
            pos_prob = jnp.take_along_axis(log_prob, pos_items[:, None], axis=-1)[:, 0]
            return pos_prob, neg, neg_prob
        return neg, neg_prob


@register_model()
class MLPRetriever(BaseRetriever):
    """MLP query tower (context only) + MLP item tower, IP scores, BPR loss,
    uniform negatives (parity: MLPRetriever)."""

    def get_item_encoder(self):
        c = self.model_config
        return MLPItemEncoder(
            data_attr=self.data_config, embedding_dim=c.embedding_dim,
            mlp_layers=tuple(c.mlp_layers), activation=c.activation,
            dropout=c.dropout, batch_norm=c.batch_norm,
        )

    def get_query_encoder(self):
        c = self.model_config
        return MLPQueryEncoder(
            data_attr=self.data_config, embedding_dim=c.embedding_dim,
            mlp_layers=tuple(c.mlp_layers), activation=c.activation,
            dropout=c.dropout, batch_norm=c.batch_norm,
        )


@register_model()
class DSSMRetriever(MLPRetriever):
    """Cosine-scored DSSM (parity: DSSMRetriever)."""

    def get_score_function(self):
        return CosineScorer()


@register_model()
class DSSMInBatchRetriever(MLPRetriever):
    """In-batch softmax with IPS popularity weighting, no explicit sampler
    (parity: DSSMInBathcRetriever — reference typo intentionally fixed)."""

    def get_score_function(self):
        return CosineScorer()

    def get_loss_function(self):
        return InBatchSoftmaxLoss(num_items=self.data_config.num_items)

    def get_negative_sampler(self):
        return None


# keep the reference's (typo'd) class name loadable from old configs
DSSMInBathcRetriever = DSSMInBatchRetriever


@register_model()
class SASRecRetriever(BaseRetriever):
    """Self-attentive sequential retriever: SASRec query tower over behavior
    sequences sharing the item-embedding tower, sampled-softmax-corrected BCE
    (parity: SASRecRetriever)."""

    def build_net(self):
        return SASRecNet(data_attr=self.data_config, config=self.model_config)

    def get_loss_function(self):
        return BinaryCrossEntropyLoss()
