"""Cross-encoder reranker (parity: Nexus/training/reranker/text_retrieval/
modeling.py:27-116): BERT over (query, passage) pairs -> scalar logit,
group-wise cross-entropy with the positive at position 0, optional KD.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.bert import BertConfig, BertEncoderModel
from nexus_tpu.modules.loss import CrossEntropyLoss, KLDivLoss
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


def group_ce_kd_loss(model, logits: Array, batch: Dict[str, Array]) -> Array:
    """Group-wise CE (positive first) + optional KD — the shared reranker
    training objective (ref modeling.py compute_loss), used by both the
    BERT and the decoder cross-encoders."""
    grouped = logits.reshape(-1, model.train_group_size)
    targets = jnp.zeros((grouped.shape[0],), jnp.int32)
    loss = model.ce(grouped, targets)
    teacher = batch.get("teacher_scores")
    if model.use_kd and teacher is not None:
        teacher_targets = jax.nn.softmax(teacher.reshape(grouped.shape), axis=-1)
        loss = loss + model.kd_loss_weight * model.kd(grouped, teacher_targets)
    return loss


class CrossEncoderNet(nn.Module):
    """BERT + scalar classification head on the pooled CLS."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # gradient checkpointing over the layer scan
    remat_policy: Optional[str] = None  # 'dots' | 'offload_dots' (models/bert.py)

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, train: bool = False,
                 position_ids=None, segment_ids=None, pool_rows=None, pool_cols=None):
        """Padded pairs by default; pass packed arrays (``segment_ids`` /
        ``position_ids`` / ``pool_rows`` / ``pool_cols`` from pack_tokenized)
        to score many pairs per 512-token row — same params, no pad FLOPs."""
        pool_gather = None if pool_rows is None else (pool_rows, pool_cols)
        out = BertEncoderModel(self.config, dtype=self.dtype, remat=self.remat,
                               remat_policy=self.remat_policy, name="bert")(
            input_ids, attention_mask=attention_mask, token_type_ids=token_type_ids,
            train=train, position_ids=position_ids, segment_ids=segment_ids,
            pool_gather=pool_gather,
        )
        pooled = out["pooler_output"]
        if pooled is None:
            hidden = out["last_hidden_state"]
            pooled = hidden[:, 0] if pool_gather is None else hidden[pool_rows, pool_cols]
        logits = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled.astype(jnp.float32))
        return logits[:, 0]


@register_model()
class CrossEncoderModel:
    model_type = "text_reranker"

    def __init__(
        self,
        bert_config: BertConfig,
        train_group_size: int = 8,
        kd_loss_weight: float = 1.0,
        use_kd: bool = False,
        dtype: str = "bfloat16",
        remat: bool = False,
        remat_policy: Optional[str] = None,
        variables: Optional[dict] = None,
    ):
        self.bert_config = bert_config
        bert_config.add_pooling_layer = True
        self.train_group_size = train_group_size
        self.use_kd = use_kd
        self.kd_loss_weight = kd_loss_weight
        self.net = CrossEncoderNet(
            bert_config, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            remat=remat, remat_policy=remat_policy,
        )
        self.variables = variables
        self.ce = CrossEntropyLoss()
        self.kd = KLDivLoss()

    def init_variables(self, rng: jax.Array) -> dict:
        if self.variables is not None:
            return self.variables
        return self.net.init(rng, jnp.ones((2, 8), jnp.int32))

    def scores(self, variables, batch, train=False, rngs=None) -> Array:
        if "pool_rows" in batch:  # packed pairs (pack_tokenized layout)
            return self.net.apply(
                variables,
                batch["input_ids"],
                token_type_ids=batch.get("token_type_ids"),
                position_ids=batch["position_ids"],
                segment_ids=batch["segment_ids"],
                pool_rows=batch["pool_rows"],
                pool_cols=batch["pool_cols"],
                train=train,
                rngs=rngs,
            )
        return self.net.apply(
            variables,
            batch["input_ids"],
            attention_mask=batch["attention_mask"],
            token_type_ids=batch.get("token_type_ids"),
            train=train,
            rngs=rngs,
        )

    def loss_fn(self, variables, batch: Dict[str, Array], rng) -> Tuple[Array, dict]:
        logits = self.scores(variables, batch, train=True, rngs={"dropout": rng})
        return group_ce_kd_loss(self, logits, batch), {"batch_stats": None}

    def eval_step(self, variables, batch) -> Tuple[Array, Array]:
        logits = self.scores(variables, batch)
        grouped = logits.reshape(-1, self.train_group_size)
        return grouped, jnp.zeros((grouped.shape[0],), jnp.int32)

    def eval_context(self, variables):
        return {}

    def compute_metrics(self, preds: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
        return {"group_accuracy": float((preds.argmax(-1) == targets).mean())}

    def save(self, output_dir: str, variables) -> None:
        import json
        import os

        from flax import serialization

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**self.bert_config.to_dict(), "model_type": "bert"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_reranker_config.json"), "w") as f:
            json.dump({"train_group_size": self.train_group_size}, f, indent=2)
        with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
            f.write(serialization.to_bytes(host))

    def load_variables(self, checkpoint_dir: str, current=None) -> dict:
        """Trainer resume protocol: restore from an HF-layout save dir."""
        from nexus_tpu.training.checkpoint import restore_flax_msgpack

        target = current or jax.eval_shape(
            lambda: self.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
        )
        return restore_flax_msgpack(checkpoint_dir, target)

    @classmethod
    def from_pretrained(cls, model_dir: str, **kw) -> "CrossEncoderModel":
        """Load from a nexus save dir or a HF torch BertForSequenceClassification dir."""
        import json
        import os

        from flax import serialization

        with open(os.path.join(model_dir, "config.json")) as f:
            bert_config = BertConfig.from_hf(json.load(f))
        nexus_cfg = os.path.join(model_dir, "nexus_reranker_config.json")
        if os.path.exists(nexus_cfg):
            with open(nexus_cfg) as f:
                kw = {**json.load(f), **kw}
        model = cls(bert_config, **kw)
        flax_path = os.path.join(model_dir, "flax_model.msgpack")
        if os.path.exists(flax_path):
            target = jax.eval_shape(
                lambda: model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            )
            with open(flax_path, "rb") as f:
                model.variables = serialization.from_bytes(target, f.read())
        else:
            model.variables = cls._convert_hf_classifier(model_dir, model)
        return model

    @staticmethod
    def _convert_hf_classifier(model_dir: str, model: "CrossEncoderModel") -> dict:
        """Convert a torch BertForSequenceClassification checkpoint."""
        from nexus_tpu.models.hf_convert import load_hf_state_dict, torch_bert_to_flax

        sd = load_hf_state_dict(model_dir)
        bert_sd = {k.removeprefix("bert."): v for k, v in sd.items() if not k.startswith("classifier")}
        inner = torch_bert_to_flax(bert_sd, model.bert_config)["params"]
        # fresh init supplies any head the torch checkpoint lacks (e.g. a plain
        # BertModel has no classifier); converted weights override the rest
        init = model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
        params = dict(init["params"])
        params["bert"] = inner
        if "classifier.weight" in sd:
            w = np.asarray(sd["classifier.weight"])
            b = np.asarray(sd["classifier.bias"])
            params["classifier"] = {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
        return {"params": params}
