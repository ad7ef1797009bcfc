"""Bi-encoder text embedder (parity: Nexus/training/embedder/text_retrieval/
modeling.py:60-416).

Loss regimes mirror the reference:
- no_in_batch_neg: per-query group scores [B, G], target 0;
- in-batch negatives: [B, B*G] score matrix, target i*G;
- cross-device negatives: under SPMD pjit this is THE SAME CODE as in-batch —
  the batch is sharded over the mesh's data axis and XLA materializes the
  global score matrix with an automatic all-gather, with exact gradients
  (the reference's manual all_gather + local-grad reinsertion trick,
  modeling.py:343-403, is what SPMD autodiff does for free).

Knowledge distillation: kl_div (per-group) or m3_kd (full-matrix) losses.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.bert import BertConfig, BertEncoderModel, pool_hidden_states
from nexus_tpu.modules.loss import CrossEntropyLoss, KLDivLoss, M3KDLoss
from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


@register_model()
class BiTextEmbedderModel:
    """Wrapper bundling the Flax encoder with contrastive/KD losses and the
    RecTrainer model protocol."""

    model_type = "text_embedder"

    def __init__(
        self,
        bert_config: BertConfig,
        model_args: Optional[TextEmbedderModelArguments] = None,
        variables: Optional[dict] = None,
    ):
        self.bert_config = bert_config
        self.args = model_args or TextEmbedderModelArguments()
        dtype = jnp.bfloat16 if self.args.dtype == "bfloat16" else jnp.float32
        bert_config.add_pooling_layer = False
        if self.args.attention_impl != "auto":
            bert_config.attention_impl = self.args.attention_impl
        self.net = BertEncoderModel(
            bert_config, dtype=dtype, remat=self.args.gradient_checkpointing,
            remat_policy=self.args.remat_policy,
            remat_plain_layers=getattr(self.args, "remat_plain_layers", 0),
        )
        self.variables = variables
        self.ce = CrossEntropyLoss()
        self.distill_loss = KLDivLoss() if self.args.kd_loss_type == "kl_div" else M3KDLoss()

    # convenience aliases used by checkpoint/save
    @property
    def model_config(self):
        return self.args

    # -- encoding ----------------------------------------------------------

    def encode(self, variables, input_ids, attention_mask, train=False, rngs=None) -> Array:
        out = self.net.apply(
            variables, input_ids, attention_mask=attention_mask, train=train, rngs=rngs
        )
        reps = pool_hidden_states(
            out["last_hidden_state"].astype(jnp.float32),
            attention_mask,
            self.args.sentence_pooling_method,
        )
        if self.args.normalize_embeddings:
            reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
        return reps

    def encode_packed(
        self, variables, input_ids, segment_ids, position_ids,
        pool_rows, pool_cols, token_seq, lengths, train=False, rngs=None,
    ) -> Array:
        """Encode PACKED rows (ops/packing.py): several short sequences share
        one [row_len] row with block-diagonal segment attention + restarting
        positions, then per-sequence pooling extracts one rep per original
        sequence. Eliminates padding waste on ragged fine-tune batches — the
        training-side counterpart of the packed inference path (~1.6x on
        MS-MARCO-like length mixes, BENCH_NOTES.md)."""
        # decoder trunks (BiDecoderOnlyEmbedderModel) take LlamaModel kwargs
        # (positions=), encoders take BERT kwargs (position_ids=) — the same
        # dispatch the packed inference path uses
        # (inference/embedder/text_retrieval.py:239-247)
        pos_kw = ("positions"
                  if getattr(self, "llama_config", None) is not None
                  else "position_ids")
        out = self.net.apply(
            variables, input_ids,
            attention_mask=(segment_ids != 0).astype(jnp.int32),
            segment_ids=segment_ids, train=train, rngs=rngs,
            **{pos_kw: position_ids},
        )
        hidden = out["last_hidden_state"].astype(jnp.float32)
        method = self.args.sentence_pooling_method
        if method == "cls":
            from nexus_tpu.ops.packing import pool_packed_cls

            reps = pool_packed_cls(hidden, pool_rows, pool_cols)
        elif method == "mean":
            from nexus_tpu.ops.packing import pool_packed_mean

            reps = pool_packed_mean(hidden, token_seq, lengths, pool_rows.shape[0])
        elif method == "last_token":
            reps = hidden[pool_rows, pool_cols + jnp.maximum(lengths, 1) - 1]
        else:
            raise ValueError(f"unknown pooling method {method!r}")
        if self.args.normalize_embeddings:
            reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
        return reps

    def _encode_side(self, variables, batch, prefix: str, train: bool, rngs) -> Array:
        """Dispatch one side (query/passage) to the packed or padded path by
        which keys the collator emitted."""
        if f"{prefix}_pool_rows" in batch:
            return self.encode_packed(
                variables,
                batch[f"{prefix}_input_ids"], batch[f"{prefix}_segment_ids"],
                batch[f"{prefix}_position_ids"], batch[f"{prefix}_pool_rows"],
                batch[f"{prefix}_pool_cols"], batch[f"{prefix}_token_seq"],
                batch[f"{prefix}_lengths"], train=train, rngs=rngs,
            )
        return self.encode(
            variables, batch[f"{prefix}_input_ids"],
            batch[f"{prefix}_attention_mask"], train=train, rngs=rngs,
        )

    # -- losses ------------------------------------------------------------

    def _local_scores(self, q_reps: Array, p_reps: Array) -> Array:
        """[B, G] scores of each query against its own passage group."""
        b = q_reps.shape[0]
        g = p_reps.shape[0] // b
        groups = p_reps.reshape(b, g, -1)
        return jnp.einsum("bd,bgd->bg", q_reps, groups) / self.args.temperature

    def _all_scores(self, q_reps: Array, p_reps: Array) -> Array:
        return (q_reps @ p_reps.T) / self.args.temperature

    def compute_loss_from_reps(
        self, q_reps: Array, p_reps: Array, teacher_scores: Optional[Array],
        no_in_batch_neg: bool,
    ) -> Array:
        b = q_reps.shape[0]
        g = p_reps.shape[0] // b
        teacher_targets = (
            jax.nn.softmax(teacher_scores.reshape(b, -1), axis=-1)
            if teacher_scores is not None
            else None
        )
        if no_in_batch_neg:
            local = self._local_scores(q_reps, p_reps)
            if teacher_targets is not None:
                loss = self.distill_loss(local, teacher_targets, group_size=g)
                if self.args.kd_loss_type == "kl_div":
                    loss = loss + self.ce(local, jnp.zeros((b,), jnp.int32))
            else:
                loss = self.ce(local, jnp.zeros((b,), jnp.int32))
            return loss
        scores = self._all_scores(q_reps, p_reps)  # [B, B*G]
        targets = jnp.arange(b, dtype=jnp.int32) * g
        if teacher_targets is not None:
            if self.args.kd_loss_type == "kl_div":
                local = self._local_scores(q_reps, p_reps)
                loss = self.distill_loss(local, teacher_targets, group_size=g)
                loss = loss + self.ce(scores, targets)
            else:
                loss = self.distill_loss(scores, teacher_targets, group_size=g)
        else:
            loss = self.ce(scores, targets)
        return loss

    # -- trainer protocol --------------------------------------------------

    def init_variables(self, rng: jax.Array) -> dict:
        if self.variables is not None:
            return self.variables
        ids = jnp.ones((2, 8), jnp.int32)
        return self.net.init(rng, ids)

    def loss_fn(self, variables, batch: Dict[str, Array], rng) -> Tuple[Array, dict]:
        q_reps = self._encode_side(
            variables, batch, "query", train=True, rngs={"dropout": rng}
        )
        p_reps = self._encode_side(
            variables, batch, "passage", train=True,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        loss = self.compute_loss_from_reps(
            q_reps, p_reps, batch.get("teacher_scores"),
            no_in_batch_neg=getattr(self, "no_in_batch_neg_flag", False),
        )
        return loss, {"batch_stats": None}

    def eval_step(self, variables, batch) -> Tuple[Array, Array]:
        """Contrastive ranking accuracy proxy: local group scores + target 0."""
        q_reps = self.encode(variables, batch["query_input_ids"], batch["query_attention_mask"])
        p_reps = self.encode(variables, batch["passage_input_ids"], batch["passage_attention_mask"])
        local = self._local_scores(q_reps, p_reps)
        return local, jnp.zeros((local.shape[0],), jnp.int32)

    def eval_context(self, variables):
        return {}

    def compute_metrics(self, preds: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
        acc = float((preds.argmax(-1) == targets).mean())
        return {"group_accuracy": acc}

    # -- persistence -------------------------------------------------------

    def save(self, output_dir: str, variables) -> None:
        """Save in an HF-compatible directory layout: config.json +
        flax_model.msgpack + our model args."""
        import json
        import os

        from flax import serialization

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**self.bert_config.to_dict(), "model_type": "bert"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_embedder_config.json"), "w") as f:
            json.dump(self.args.to_dict(), f, indent=2)
        with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
            f.write(serialization.to_bytes(host))

    def load_variables(self, checkpoint_dir: str, current=None) -> dict:
        """Trainer resume protocol: restore variables from a dir written by
        save() (HF-layout: flax_model.msgpack) without re-deriving the model
        class from a rec-style model_config.json."""
        from nexus_tpu.training.checkpoint import restore_flax_msgpack

        target = current or jax.eval_shape(
            lambda: self.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
        )
        return restore_flax_msgpack(checkpoint_dir, target)

    @classmethod
    def from_pretrained(cls, model_dir: str, model_args=None) -> "BiTextEmbedderModel":
        """Load from either a nexus_tpu save dir (flax_model.msgpack) or a HF
        torch checkpoint dir (model.safetensors / pytorch_model.bin)."""
        import json
        import os

        from flax import serialization

        cfg_path = os.path.join(model_dir, "config.json")
        with open(cfg_path) as f:
            bert_config = BertConfig.from_hf(json.load(f))
        bert_config.add_pooling_layer = False
        nexus_cfg = os.path.join(model_dir, "nexus_embedder_config.json")
        if model_args is None and os.path.exists(nexus_cfg):
            with open(nexus_cfg) as f:
                model_args = TextEmbedderModelArguments.from_dict(json.load(f))
        model = cls(bert_config, model_args)
        flax_path = os.path.join(model_dir, "flax_model.msgpack")
        if os.path.exists(flax_path):
            target = jax.eval_shape(
                lambda: model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            )
            with open(flax_path, "rb") as f:
                model.variables = serialization.from_bytes(target, f.read())
        else:
            from nexus_tpu.models.hf_convert import load_hf_bert

            dtype = jnp.bfloat16 if model.args.dtype == "bfloat16" else jnp.float32
            _, variables = load_hf_bert(
                model_dir, dtype=dtype, add_pooling_layer=False,
                plain_layers=(getattr(model.args, "remat_plain_layers", 0)
                              if model.args.gradient_checkpointing else 0),
            )
            model.variables = variables
        return model
