"""Decoder-backbone (LLM) cross-encoder reranker (parity:
Nexus/training/reranker/text_retrieval/modeling.py:53 `yes_loc` +
runner.py:104 `AutoModelForSequenceClassification`, which resolves to
`LlamaForSequenceClassification` for causal backbones: last-non-pad-token
hidden state -> Linear(1, bias=False) score head).

TPU-first composition of pieces that already exist in this repo: the Llama
trunk (models/llama.py) with optional LoRA adapters (models/lora.py),
last-token pooling, and — when importing a *causal-LM* checkpoint that has
no score head — the yes/no LM-head scoring-vector trick
(models/hf_convert.py qwen3vl_binary_score_vector,
inference/reranker/multimodal.py:104-120): the score kernel initializes to
w_yes - w_no so a fresh reranker starts from the LM's own relevance logit.

Training protocol (group CE with the positive first + optional KD) is shared
with the BERT cross-encoder; the trainer sees the same interface.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.llama import LlamaConfig, LlamaModel
from nexus_tpu.models.lora import (
    apply_adapter_params,
    extract_lora_params,
    lora_param_filter,
    merge_lora_params,
)
from nexus_tpu.modules.loss import CrossEntropyLoss, KLDivLoss
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


class DecoderCrossEncoderNet(nn.Module):
    """Llama trunk + scalar score head on the last valid token.

    Matches HF `LlamaForSequenceClassification(num_labels=1)`: the pooled
    representation is the hidden state of the last non-pad token (right
    padding assumed, as in the collator), projected by a bias-free Dense.
    """

    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    remat_policy: Optional[str] = None  # 'dots' | 'offload_dots' (models/bert.py)

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, train: bool = False,
                 position_ids=None, segment_ids=None, pool_rows=None,
                 pool_cols=None, seq_lengths=None):
        """Padded pairs by default; pass packed arrays (``segment_ids`` /
        ``position_ids`` / ``pool_rows`` / ``pool_cols`` / ``seq_lengths``
        from pack_tokenized) to score many pairs per row — the decoder pools
        each segment's LAST token (col = pool_col + length - 1)."""
        c = self.config
        if segment_ids is not None:
            out = LlamaModel(c, dtype=self.dtype, remat=self.remat,
                             remat_policy=self.remat_policy, name="model")(
                input_ids, attention_mask=(segment_ids != 0).astype(jnp.int32),
                positions=position_ids, segment_ids=segment_ids, train=train,
            )
            hidden = out["last_hidden_state"].astype(jnp.float32)
            last_cols = pool_cols + jnp.maximum(seq_lengths, 1) - 1
            pooled = hidden[pool_rows, last_cols]  # [N, H]
        else:
            if attention_mask is None:
                attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            out = LlamaModel(c, dtype=self.dtype, remat=self.remat,
                             remat_policy=self.remat_policy, name="model")(
                input_ids, attention_mask=attention_mask, train=train
            )
            hidden = out["last_hidden_state"].astype(jnp.float32)  # [B, L, H]
            last = jnp.maximum(jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1, 0)
            pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]  # [B, H]
        logits = nn.Dense(1, use_bias=False, dtype=jnp.float32, name="score")(pooled)
        return logits[:, 0]


@register_model()
class DecoderCrossEncoderModel:
    """LLM cross-encoder with the same trainer/inference protocol as the
    BERT `CrossEncoderModel` — `scores(variables, batch)` ignores
    token_type_ids so the shared inference session feed works unchanged."""

    model_type = "decoder_text_reranker"

    def __init__(
        self,
        llama_config: LlamaConfig,
        train_group_size: int = 8,
        kd_loss_weight: float = 1.0,
        use_kd: bool = False,
        dtype: str = "bfloat16",
        remat: bool = False,
        remat_policy: Optional[str] = None,
        variables: Optional[dict] = None,
    ):
        self.llama_config = llama_config
        self.train_group_size = train_group_size
        self.use_kd = use_kd
        self.kd_loss_weight = kd_loss_weight
        self.remat = remat
        self.net = DecoderCrossEncoderNet(
            llama_config,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            remat=remat, remat_policy=remat_policy,
        )
        self.variables = variables
        self.ce = CrossEntropyLoss()
        self.kd = KLDivLoss()

    # -- trainer protocol --------------------------------------------------

    @property
    def uses_lora(self) -> bool:
        return self.llama_config.lora_rank > 0

    def trainable_filter(self):
        """optax mask for adapter training: LoRA params AND the score head
        train; the frozen base trunk does not. (The score head is fresh —
        or the repurposed yes-logit vector — either way it must train.)"""
        if not self.uses_lora or self.variables is None:
            return None
        mask = lora_param_filter(self.variables["params"])
        mask = dict(mask)
        mask["score"] = jax.tree_util.tree_map(lambda _: True, self.variables["params"]["score"])
        return {"params": mask}

    def init_variables(self, rng: jax.Array) -> dict:
        if self.variables is not None:
            return self.variables
        return self.net.init(rng, jnp.ones((2, 8), jnp.int32))

    def scores(self, variables, batch, train=False, rngs=None) -> Array:
        if "pool_rows" in batch:  # packed pairs (pack_tokenized layout)
            return self.net.apply(
                variables,
                batch["input_ids"],
                position_ids=batch["position_ids"],
                segment_ids=batch["segment_ids"],
                pool_rows=batch["pool_rows"],
                pool_cols=batch["pool_cols"],
                seq_lengths=batch["lengths"],
                train=train,
                rngs=rngs,
            )
        return self.net.apply(
            variables,
            batch["input_ids"],
            attention_mask=batch["attention_mask"],
            train=train,
            rngs=rngs,
        )

    def loss_fn(self, variables, batch: Dict[str, Array], rng) -> Tuple[Array, dict]:
        from nexus_tpu.training.reranker.text_retrieval.modeling import group_ce_kd_loss

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

    # -- persistence -------------------------------------------------------

    def _eval_shape_target(self):
        return jax.eval_shape(
            lambda: self.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
        )

    def save(self, output_dir: str, variables) -> None:
        from flax import serialization

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**self.llama_config.to_dict(), "model_type": "llama"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_reranker_config.json"), "w") as f:
            json.dump(
                {"train_group_size": self.train_group_size, "decoder_only": True}, f, indent=2
            )
        if self.uses_lora:
            # adapters + the (small) score head; the base trunk reloads from
            # the original checkpoint at from_pretrained time
            adapters = extract_lora_params(variables["params"])
            adapters["score"] = jax.tree_util.tree_map(np.asarray, variables["params"]["score"])
            with open(os.path.join(output_dir, "adapter_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(np.asarray, adapters)
                f.write(serialization.to_bytes(host))
        else:
            with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(np.asarray, variables)
                f.write(serialization.to_bytes(host))

    def save_merged_model(self, output_dir: str, variables) -> None:
        """Fold LoRA into the base weights and save a plain checkpoint."""
        from flax import serialization

        merged = {"params": merge_lora_params(variables["params"], self.llama_config.lora_alpha)}
        os.makedirs(output_dir, exist_ok=True)
        cfg = LlamaConfig.from_dict(self.llama_config.to_dict())
        cfg.lora_rank = 0
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**cfg.to_dict(), "model_type": "llama"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_reranker_config.json"), "w") as f:
            # 'merged' marks the flax weights as ALREADY containing the
            # adapters — from_pretrained must not overlay adapter_model
            # on top (that would double the LoRA delta)
            json.dump(
                {"train_group_size": self.train_group_size, "decoder_only": True,
                 "merged": True}, f, indent=2
            )
        with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
            host = jax.tree_util.tree_map(np.asarray, merged)
            f.write(serialization.to_bytes(host))

    def load_variables(self, checkpoint_dir: str, current=None) -> dict:
        """Trainer resume protocol: full msgpack, or adapters+score over the
        current base weights for LoRA runs."""
        from flax import serialization

        flax_path = os.path.join(checkpoint_dir, "flax_model.msgpack")
        adapter_path = os.path.join(checkpoint_dir, "adapter_model.msgpack")
        if os.path.exists(flax_path):
            target = current or self._eval_shape_target()
            with open(flax_path, "rb") as f:
                return serialization.from_bytes(target, f.read())
        if os.path.exists(adapter_path):
            if current is None:
                raise ValueError("adapter-only checkpoint needs current base variables")
            with open(adapter_path, "rb") as f:
                adapters = serialization.msgpack_restore(f.read())
            params = apply_adapter_params(current["params"], adapters)
            if "score" in adapters:
                params = {**params, "score": jax.tree_util.tree_map(
                    jnp.asarray, adapters["score"]
                )}
            return {**current, "params": params}
        raise FileNotFoundError(
            f"no flax_model.msgpack or adapter_model.msgpack in {checkpoint_dir}"
        )

    # -- construction ------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        lora_rank: int = 0,
        lora_alpha: float = 16.0,
        yes_token: str = "Yes",
        no_token: str = "No",
        tokenizer=None,
        **kw,
    ) -> "DecoderCrossEncoderModel":
        """Load from a nexus save dir or a raw HF checkpoint dir.

        HF checkpoints come in two shapes:
        - `LlamaForSequenceClassification` (has ``score.weight``) — direct map;
        - causal LM (has ``lm_head.weight`` / tied embeddings) — the score
          kernel initializes to w_yes - w_no, the LM's own binary relevance
          direction (reference yes_loc trick, modeling.py:53).
        """
        from flax import serialization

        with open(os.path.join(model_dir, "config.json")) as f:
            config = LlamaConfig.from_hf(json.load(f))
        config.lora_rank = lora_rank
        config.lora_alpha = lora_alpha
        nexus_cfg = os.path.join(model_dir, "nexus_reranker_config.json")
        merged = False
        if os.path.exists(nexus_cfg):
            with open(nexus_cfg) as f:
                d = json.load(f)
                d.pop("decoder_only", None)
                merged = bool(d.pop("merged", False))
                kw = {**d, **kw}
        model = cls(config, **kw)

        flax_path = os.path.join(model_dir, "flax_model.msgpack")
        if os.path.exists(flax_path):
            if lora_rank > 0:
                # checkpoint was saved without adapters: restore into the
                # plain layout, then graft fresh LoRA factors around it
                from nexus_tpu.models.lora import graft_lora_init

                plain_cfg = LlamaConfig.from_dict(config.to_dict())
                plain_cfg.lora_rank = 0
                plain = cls(plain_cfg, **kw)
                with open(flax_path, "rb") as f:
                    restored = serialization.from_bytes(plain._eval_shape_target(), f.read())
                init = model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
                model.variables = {
                    "params": graft_lora_init(restored["params"], init["params"])
                }
            else:
                target = model._eval_shape_target()
                with open(flax_path, "rb") as f:
                    model.variables = serialization.from_bytes(target, f.read())
        else:
            model.variables = cls._convert_hf(
                model_dir, model, yes_token=yes_token, no_token=no_token, tokenizer=tokenizer
            )

        adapter = os.path.join(model_dir, "adapter_model.msgpack")
        if os.path.exists(adapter) and model.variables is not None and not merged:
            # base weights + trained adapters (resume flow). Skipped for
            # merged saves: the flax weights already CONTAIN the adapters,
            # overlaying again would double the LoRA delta.
            with open(adapter, "rb") as f:
                adapters = serialization.msgpack_restore(f.read())
            params = apply_adapter_params(model.variables["params"], adapters)
            if "score" in adapters:
                params = {**params, "score": jax.tree_util.tree_map(
                    jnp.asarray, adapters["score"]
                )}
            model.variables = {**model.variables, "params": params}
        return model

    @staticmethod
    def _convert_hf(
        model_dir: str,
        model: "DecoderCrossEncoderModel",
        yes_token: str = "Yes",
        no_token: str = "No",
        tokenizer=None,
    ) -> dict:
        from nexus_tpu.models.hf_convert import load_hf_state_dict, torch_llama_to_flax

        sd = load_hf_state_dict(model_dir)

        lora = model.llama_config.lora_rank > 0
        trunk_sd = {k: v for k, v in sd.items() if not k.startswith(("score.", "lm_head."))}
        dtype = model.net.dtype
        converted = torch_llama_to_flax(trunk_sd, model.llama_config, dtype=dtype, lora=lora)

        init = model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
        params = dict(init["params"])
        if lora:
            from nexus_tpu.models.lora import graft_lora_init

            params["model"] = graft_lora_init(converted["params"], init["params"]["model"])
        else:
            params["model"] = converted["params"]

        def _np(v):
            return v.float().numpy() if hasattr(v, "float") else np.asarray(v, np.float32)

        if "score.weight" in sd:  # LlamaForSequenceClassification head
            params["score"] = {"kernel": jnp.asarray(_np(sd["score.weight"]).T, jnp.float32)}
        else:  # causal LM: yes - no LM-head rows
            if tokenizer is None:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(model_dir)
            yes_id = tokenizer(yes_token, add_special_tokens=False)["input_ids"][-1]
            no_id = tokenizer(no_token, add_special_tokens=False)["input_ids"][-1]
            if "lm_head.weight" in sd:
                w = _np(sd["lm_head.weight"])
            else:  # tied embeddings
                key = next(k for k in sd if k.endswith("embed_tokens.weight"))
                w = _np(sd[key])
            vec = (w[yes_id] - w[no_id]).astype(np.float32)
            params["score"] = {"kernel": jnp.asarray(vec[:, None])}
        return {"params": params}


def load_reranker_model(model_dir: str, **kw):
    """Factory shared by the training runner and the inference engine:
    inspects ``config.json``'s model_type and returns the matching
    cross-encoder class (BERT head vs decoder last-token yes-logit).
    Mirrors the reference's `AutoModelForSequenceClassification` dispatch
    (runner.py:104) without the torch auto-registry."""
    # backbones the Llama trunk represents exactly: llama/mistral (plain),
    # qwen2 (QKV biases), qwen3 (q/k RMSNorm + decoupled head_dim) — all
    # torch-parity-tested. gemma (GeGLU, different norm placement) is NOT
    # representable and intentionally absent.
    decoder_types = {"llama", "qwen2", "qwen3", "mistral"}
    with open(os.path.join(model_dir, "config.json")) as f:
        model_type = json.load(f).get("model_type", "bert")
    if model_type in decoder_types:
        return DecoderCrossEncoderModel.from_pretrained(model_dir, **kw)
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel

    for k in ("lora_rank", "lora_alpha", "yes_token", "no_token", "tokenizer"):
        kw.pop(k, None)  # decoder-only knobs
    return CrossEncoderModel.from_pretrained(model_dir, **kw)
