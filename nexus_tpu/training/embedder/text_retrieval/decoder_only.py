"""Decoder-only (LLM) bi-encoder embedder with LoRA
(parity: Nexus/training/embedder/text_retrieval/decoder_only/):
same contrastive recipe as the encoder embedder, with last-token pooling
over a causal Llama/Qwen-class backbone and optional LoRA adapters
(load_model.py:13-121, save_merged_model l.123, find_largest_checkpoint l.13).
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.llama import LlamaConfig, LlamaModel
from nexus_tpu.models.lora import extract_lora_params, lora_param_filter, merge_lora_params
from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments
from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
from nexus_tpu.utils.registry import register_model


def find_largest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Latest checkpoint-<step> subdir (parity: load_model.py:13-36)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(checkpoint_dir, name), int(m.group(1))
    return best


@register_model()
class BiDecoderOnlyEmbedderModel(BiTextEmbedderModel):
    """Causal-LM bi-encoder: last-token pooling, instructions on queries only,
    LoRA-adapters training mode."""

    model_type = "decoder_only_embedder"

    def __init__(
        self,
        llama_config: LlamaConfig,
        model_args: Optional[TextEmbedderModelArguments] = None,
        variables: Optional[dict] = None,
        ring_mesh=None,
    ):
        """``ring_mesh``: a Mesh with an `sp` axis — with
        ``attention_impl='ring'`` the trunk's attention runs sequence-sharded
        over it (ops/ring_attention.py), for fine-tune contexts beyond one
        chip's activation memory."""
        self.bert_config = llama_config  # name kept for base-class save path
        self.llama_config = llama_config
        args = model_args or TextEmbedderModelArguments()
        if args.sentence_pooling_method == "cls":
            args.sentence_pooling_method = "last_token"
        if args.attention_impl != "auto":
            # same knob as the encoder twin (modeling.py): xla | pallas |
            # fused (ops/fused_decoder.py megakernel)
            llama_config.attention_impl = args.attention_impl
        self.args = args
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        # honor the same remat knobs as the encoder twin (modeling.py:52-54)
        # — fine-tuning a 1B-scale trunk at seq 512 without remat does not
        # fit 16 GB HBM
        self.net = LlamaModel(llama_config, dtype=dtype, ring_mesh=ring_mesh,
                              remat=args.gradient_checkpointing,
                              remat_policy=args.remat_policy)
        self.variables = variables
        from nexus_tpu.modules.loss import CrossEntropyLoss, KLDivLoss, M3KDLoss

        self.ce = CrossEntropyLoss()
        self.distill_loss = KLDivLoss() if args.kd_loss_type == "kl_div" else M3KDLoss()

    @property
    def uses_lora(self) -> bool:
        return self.llama_config.lora_rank > 0

    def trainable_filter(self):
        """optax mask: adapters-only training when LoRA is enabled."""
        if not self.uses_lora or self.variables is None:
            return None
        return {"params": lora_param_filter(self.variables["params"])}

    def init_variables(self, rng: jax.Array) -> dict:
        if self.variables is not None:
            return self.variables
        return self.net.init(rng, jnp.ones((2, 8), jnp.int32))

    # -- persistence -------------------------------------------------------

    def save(self, output_dir: str, variables) -> None:
        from flax import serialization

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**self.llama_config.to_dict(), "model_type": "llama"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_embedder_config.json"), "w") as f:
            json.dump({**self.args.to_dict(), "decoder_only": True}, f, indent=2)
        if self.uses_lora:
            adapters = extract_lora_params(variables["params"])
            with open(os.path.join(output_dir, "adapter_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(lambda x: np.asarray(x), adapters)
                f.write(serialization.to_bytes(host))
        else:
            with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
                f.write(serialization.to_bytes(host))

    def save_merged_model(self, output_dir: str, variables) -> None:
        """Fold LoRA into base weights and save a plain model
        (parity: load_model.py save_merged_model)."""
        from flax import serialization

        merged = {"params": merge_lora_params(variables["params"], self.llama_config.lora_alpha)}
        os.makedirs(output_dir, exist_ok=True)
        cfg = LlamaConfig.from_dict(self.llama_config.to_dict())
        cfg.lora_rank = 0
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**cfg.to_dict(), "model_type": "llama"}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_embedder_config.json"), "w") as f:
            # 'merged': adapters are folded in — from_pretrained must not
            # overlay adapter_model.msgpack again
            json.dump({**self.args.to_dict(), "decoder_only": True, "merged": True},
                      f, indent=2)
        with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), merged)
            f.write(serialization.to_bytes(host))

    def load_variables(self, checkpoint_dir: str, current=None) -> dict:
        """Trainer resume protocol. LoRA runs restore adapters over the
        current base weights; full runs restore flax_model.msgpack."""
        from flax import serialization

        flax_path = os.path.join(checkpoint_dir, "flax_model.msgpack")
        adapter_path = os.path.join(checkpoint_dir, "adapter_model.msgpack")
        if os.path.exists(flax_path):
            target = current or jax.eval_shape(
                lambda: self.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            )
            with open(flax_path, "rb") as f:
                return serialization.from_bytes(target, f.read())
        if os.path.exists(adapter_path):
            if current is None:
                raise ValueError("adapter-only checkpoint needs current base variables")
            from nexus_tpu.models.lora import apply_adapter_params

            with open(adapter_path, "rb") as f:
                adapters = serialization.msgpack_restore(f.read())
            return {**current, "params": apply_adapter_params(current["params"], adapters)}
        raise FileNotFoundError(
            f"no flax_model.msgpack or adapter_model.msgpack in {checkpoint_dir}"
        )

    @classmethod
    def from_pretrained(
        cls, model_dir: str, model_args=None, lora_rank: int = 0, lora_alpha: float = 16.0,
    ) -> "BiDecoderOnlyEmbedderModel":
        from flax import serialization

        with open(os.path.join(model_dir, "config.json")) as f:
            config = LlamaConfig.from_hf(json.load(f))
        config.lora_rank = lora_rank
        config.lora_alpha = lora_alpha
        nexus_cfg = os.path.join(model_dir, "nexus_embedder_config.json")
        merged = False
        if os.path.exists(nexus_cfg):
            with open(nexus_cfg) as f:
                d = json.load(f)
                d.pop("decoder_only", None)
                merged = bool(d.pop("merged", False))
                if model_args is None:
                    model_args = TextEmbedderModelArguments.from_dict(d)
        model = cls(config, model_args)

        flax_path = os.path.join(model_dir, "flax_model.msgpack")
        if os.path.exists(flax_path):
            target = jax.eval_shape(
                lambda: model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            )
            with open(flax_path, "rb") as f:
                model.variables = serialization.from_bytes(target, f.read())
        else:
            # HF torch checkpoint
            from nexus_tpu.models.hf_convert import load_hf_state_dict, torch_llama_to_flax

            sd = load_hf_state_dict(model_dir)
            dtype = jnp.bfloat16 if model.args.dtype == "bfloat16" else jnp.float32
            converted = torch_llama_to_flax(sd, config, dtype=dtype, lora=lora_rank > 0)
            if lora_rank > 0:
                # graft fresh adapters over the converted base weights
                from nexus_tpu.models.lora import graft_lora_init

                init = model.net.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
                converted = {"params": graft_lora_init(converted["params"], init["params"])}
            model.variables = converted

        # resume from latest adapter checkpoint if present (skipped for
        # merged saves — the weights already contain the adapters)
        adapter = os.path.join(model_dir, "adapter_model.msgpack")
        if os.path.exists(adapter) and model.variables is not None and not merged:
            from nexus_tpu.models.lora import apply_adapter_params

            with open(adapter, "rb") as f:
                adapters = serialization.msgpack_restore(f.read())
            model.variables = {
                **model.variables,
                "params": apply_adapter_params(model.variables["params"], adapters),
            }
        return model


def _cli():
    """Decoder-only embedder training CLI (parity: Nexus/training/embedder/
    text_retrieval/decoder_only/__main__.py): last-token pooling + optional
    LoRA adapters over a causal backbone, through the standard runner.

        python -m nexus_tpu.training.embedder.text_retrieval.decoder_only \
            --model_name_or_path /path/to/llama --train_data a.jsonl \
            --output_dir ./out [--lora_rank 16 --lora_alpha 32]
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name_or_path", required=True)
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--output_dir", default="./saves/llm_embedder")
    ap.add_argument("--lora_rank", type=int, default=0)
    ap.add_argument("--lora_alpha", type=float, default=16.0)
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train_group_size", type=int, default=8)
    ap.add_argument("--query_max_len", type=int, default=512)
    ap.add_argument("--passage_max_len", type=int, default=512)
    ap.add_argument("--query_instruction_for_retrieval", default=None)
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--per_device_train_batch_size", type=int, default=16)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--logging_steps", type=int, default=20)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--save_merged", action="store_true",
                    help="also export base+adapters merged for plain serving")
    ap.add_argument("--resume_from_checkpoint", default=None)
    ns = ap.parse_args()

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval import (
        TextEmbedderDataArguments,
        TextEmbedderModelArguments,
        TextEmbedderRunner,
    )

    margs = TextEmbedderModelArguments(
        model_name_or_path=ns.model_name_or_path,
        sentence_pooling_method="last_token",
        temperature=ns.temperature, dtype=ns.dtype,
    )
    model = BiDecoderOnlyEmbedderModel.from_pretrained(
        ns.model_name_or_path, margs,
        lora_rank=ns.lora_rank, lora_alpha=ns.lora_alpha,
    )
    runner = TextEmbedderRunner(
        margs,
        TextEmbedderDataArguments(
            train_data=ns.train_data,
            train_group_size=ns.train_group_size,
            query_max_len=ns.query_max_len,
            passage_max_len=ns.passage_max_len,
            query_instruction_for_retrieval=ns.query_instruction_for_retrieval,
        ),
        TrainingArguments.from_dict(dict(
            output_dir=ns.output_dir, num_train_epochs=ns.num_train_epochs,
            per_device_train_batch_size=ns.per_device_train_batch_size,
            learning_rate=ns.learning_rate, logging_steps=ns.logging_steps,
            max_steps=ns.max_steps, optimizer="adamw", evaluation_strategy="no",
        )),
        model=model,
    )
    state = runner.run(resume_from_checkpoint=ns.resume_from_checkpoint)
    if ns.save_merged and model.uses_lora:
        model.save_merged_model(os.path.join(ns.output_dir, "merged"),
                                state.variables)


if __name__ == "__main__":
    _cli()
