"""Multimodal bi-encoder embedder (parity: Nexus/training/embedder/
multimodal_retrieval/modeling.py:92-150 + the shared contrastive recipe).

Same three-regime contrastive/KD losses as the text embedder over a VLM
backbone (vision tower + causal trunk) with last-token pooling, plus the
reference's `local_loss_weight` extra local term.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.bert import pool_hidden_states
from nexus_tpu.models.vlm import VLMBackbone, VLMConfig
from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments
from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
from nexus_tpu.utils.registry import register_model

Array = jnp.ndarray


@register_model()
class BiMultimodalEmbedderModel(BiTextEmbedderModel):
    model_type = "multimodal_embedder"

    def __init__(
        self,
        vlm_config,
        model_args: Optional[TextEmbedderModelArguments] = None,
        variables: Optional[dict] = None,
        local_loss_weight: float = 0.0,
        backbone_type: str = "nexus-vlm",  # nexus-vlm | qwen2-vl | qwen2.5-vl | qwen3-vl
        grid_thw: Tuple[int, int, int] = (1, 16, 16),  # static patch grid (qwen-vl family)
    ):
        self.bert_config = vlm_config  # base-class compat
        self.vlm_config = vlm_config
        self.backbone_type = backbone_type
        self.grid_thw = tuple(grid_thw)
        args = model_args or TextEmbedderModelArguments()
        if args.sentence_pooling_method == "cls":
            args.sentence_pooling_method = "last_token"
        self.args = args
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        if backbone_type in ("qwen3-vl", "qwen3.5"):
            from nexus_tpu.models.qwen3_vl import Qwen3VLBackbone

            self.net = Qwen3VLBackbone(
                vlm_config, grid_thw=self.grid_thw, dtype=dtype,
                remat=args.gradient_checkpointing,
            )
        elif backbone_type in ("qwen2-vl", "qwen2.5-vl"):
            from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone

            self.net = Qwen2VLBackbone(
                vlm_config, grid_thw=self.grid_thw, dtype=dtype,
                remat=args.gradient_checkpointing,
            )
        else:
            self.net = VLMBackbone(vlm_config, dtype=dtype)
        self.variables = variables
        self.local_loss_weight = local_loss_weight
        from nexus_tpu.modules.loss import CrossEntropyLoss, KLDivLoss, M3KDLoss

        self.ce = CrossEntropyLoss()
        self.distill_loss = KLDivLoss() if args.kd_loss_type == "kl_div" else M3KDLoss()

    @classmethod
    def from_hf_pretrained(
        cls, model_dir: str, model_args: Optional[TextEmbedderModelArguments] = None,
        image_size: int = 224, lora_rank: int = 0, lora_alpha: float = 16.0,
        video_frames: int = 0, **kw,
    ) -> "BiMultimodalEmbedderModel":
        """Load a real HF Qwen-VL-family checkpoint directory (weights
        converted to the TPU layout; parity-tested in tests/test_qwen2_vl.py
        and tests/test_qwen3_vl.py). The static patch grid follows the pinned
        processor resolution. With ``lora_rank > 0`` the text trunk's
        attention projections get trainable LoRA adapters over frozen base
        weights (parity: the reference's use_lora VLM wrap,
        Nexus/training/embedder/multimodal_retrieval/modeling.py:92-150)."""
        import json as _json

        with open(os.path.join(model_dir, "config.json")) as f:
            model_type = _json.load(f).get("model_type", "")
        model_args = model_args or TextEmbedderModelArguments()
        dtype = jnp.bfloat16 if model_args.dtype == "bfloat16" else jnp.float32
        use_lora = lora_rank > 0
        if "qwen3" in str(model_type):
            from nexus_tpu.models.hf_convert import load_hf_qwen3vl

            config, variables = load_hf_qwen3vl(model_dir, dtype=dtype, lora=use_lora)
        else:
            from nexus_tpu.models.hf_convert import load_hf_qwen2vl

            config, variables = load_hf_qwen2vl(model_dir, dtype=dtype, lora=use_lora)
        config.text.lora_rank = lora_rank
        config.text.lora_alpha = lora_alpha
        g = image_size // config.vision.patch_size
        # video mode: pin a (T, g, g) temporal patch grid — every vision
        # entry becomes one video block of T*temporal_patch_size frames
        grid_t = max(video_frames // config.vision.temporal_patch_size, 1)
        if grid_t > 1 and config.variant in ("qwen3-vl", "qwen3.5"):
            raise ValueError(
                "qwen3-vl represents videos as timestamp-interleaved (1, g, g) "
                "blocks, not one (T, g, g) grid — leave video_frames=0: the "
                "processor adapter emits the timestamp layout automatically "
                "for qwen3-vl (video_timestamps mode)"
            )
        model = cls(config, model_args, variables=None,
                    backbone_type=config.variant, grid_thw=(grid_t, g, g), **kw)
        if use_lora:
            from nexus_tpu.models.lora import graft_lora_init

            init = model.init_variables(jax.random.PRNGKey(0))
            variables = {"params": graft_lora_init(variables["params"], init["params"])}
        model.variables = variables
        return model

    # -- LoRA adapter training ----------------------------------------------

    @property
    def uses_lora(self) -> bool:
        text = getattr(self.vlm_config, "text", None)
        return getattr(text, "lora_rank", 0) > 0

    def trainable_filter(self):
        """optax mask: adapters-only training when LoRA is enabled."""
        if not self.uses_lora or self.variables is None:
            return None
        from nexus_tpu.models.lora import lora_param_filter

        return {"params": lora_param_filter(self.variables["params"])}

    def save_merged_model(self, output_dir: str, variables) -> None:
        """Fold LoRA into the base text-trunk weights and save a plain model
        (parity: decoder_only save_merged_model applied to the VLM)."""
        from flax import serialization

        from nexus_tpu.models.lora import merge_lora_params

        merged = {"params": merge_lora_params(
            variables["params"], self.vlm_config.text.lora_alpha
        )}
        os.makedirs(output_dir, exist_ok=True)
        cfg = json.loads(json.dumps(self.vlm_config.to_dict(), default=str))
        cfg.get("text", {}).update(lora_rank=0)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({**cfg, "model_type": self.backbone_type,
                       "grid_thw": list(self.grid_thw)}, f, indent=2)
        with open(os.path.join(output_dir, "nexus_embedder_config.json"), "w") as f:
            json.dump({**self.args.to_dict(), "multimodal": True}, f, indent=2)
        with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), merged)
            f.write(serialization.to_bytes(host))

    # -- encoding over multimodal feeds -------------------------------------

    def encode_feed(self, variables, feed: Dict[str, Array], train=False, rngs=None) -> Array:
        if self.backbone_type in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5"):
            out = self.net.apply(
                variables,
                input_ids=feed["input_ids"],
                attention_mask=feed["attention_mask"],
                pixel_patches=feed.get("pixel_patches"),
                positions3=feed.get("positions3"),
                train=train,
                rngs=rngs,
            )
        else:
            out = self.net.apply(
                variables,
                input_ids=feed["input_ids"],
                attention_mask=feed["attention_mask"],
                pixel_values=feed.get("pixel_values"),
                image_slot_mask=feed.get("image_slot_mask"),
                train=train,
                rngs=rngs,
            )
        reps = pool_hidden_states(
            out["last_hidden_state"].astype(jnp.float32),
            feed["attention_mask"],
            self.args.sentence_pooling_method,
        )
        if self.args.normalize_embeddings:
            reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
        return reps

    def init_variables(self, rng: jax.Array) -> dict:
        if self.variables is not None:
            return self.variables
        c = self.vlm_config
        b, l = 2, 32
        if self.backbone_type in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5"):
            t, h, w = self.grid_thw
            patches = jnp.zeros((1, t * h * w, c.vision.patch_dim))
            return self.net.init(
                rng, input_ids=jnp.ones((b, l), jnp.int32),
                attention_mask=jnp.ones((b, l), jnp.int32), pixel_patches=patches,
            )
        feed = {
            "input_ids": jnp.ones((b, l), jnp.int32),
            "attention_mask": jnp.ones((b, l), jnp.int32),
            "pixel_values": jnp.zeros((b, 1, c.vision.image_size, c.vision.image_size, 3)),
            "image_slot_mask": jnp.zeros((b, l), jnp.int32),
        }
        return self.net.init(
            rng, input_ids=feed["input_ids"], attention_mask=feed["attention_mask"],
            pixel_values=feed["pixel_values"], image_slot_mask=feed["image_slot_mask"],
        )

    def loss_fn(self, variables, batch: Dict[str, Array], rng) -> Tuple[Array, dict]:
        q_feed = {k.removeprefix("query_"): v for k, v in batch.items() if k.startswith("query_")}
        p_feed = {k.removeprefix("passage_"): v for k, v in batch.items() if k.startswith("passage_")}
        q_reps = self.encode_feed(variables, q_feed, train=True, rngs={"dropout": rng})
        p_reps = self.encode_feed(
            variables, p_feed, train=True, rngs={"dropout": jax.random.fold_in(rng, 1)}
        )
        loss = self.compute_loss_from_reps(
            q_reps, p_reps, batch.get("teacher_scores"),
            no_in_batch_neg=getattr(self, "no_in_batch_neg_flag", False),
        )
        if self.local_loss_weight > 0:
            local = self._local_scores(q_reps, p_reps)
            local_loss = self.ce(local, jnp.zeros((local.shape[0],), jnp.int32))
            loss = loss + self.local_loss_weight * local_loss
        return loss, {"batch_stats": None}

    def eval_step(self, variables, batch):
        q_feed = {k.removeprefix("query_"): v for k, v in batch.items() if k.startswith("query_")}
        p_feed = {k.removeprefix("passage_"): v for k, v in batch.items() if k.startswith("passage_")}
        q_reps = self.encode_feed(variables, q_feed)
        p_reps = self.encode_feed(variables, p_feed)
        local = self._local_scores(q_reps, p_reps)
        return local, jnp.zeros((local.shape[0],), jnp.int32)

    # -- persistence --------------------------------------------------------

    def save(self, output_dir: str, variables) -> None:
        from flax import serialization

        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump(
                {**self.vlm_config.to_dict(), "model_type": self.backbone_type,
                 "grid_thw": list(self.grid_thw)},
                f, indent=2, default=str,
            )
        with open(os.path.join(output_dir, "nexus_embedder_config.json"), "w") as f:
            json.dump({**self.args.to_dict(), "multimodal": True}, f, indent=2)
        if self.uses_lora:
            from nexus_tpu.models.lora import extract_lora_params

            adapters = extract_lora_params(variables["params"])
            with open(os.path.join(output_dir, "adapter_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(lambda x: np.asarray(x), adapters)
                f.write(serialization.to_bytes(host))
        else:
            with open(os.path.join(output_dir, "flax_model.msgpack"), "wb") as f:
                host = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
                f.write(serialization.to_bytes(host))

    def load_variables(self, checkpoint_dir: str, current=None) -> dict:
        """Trainer resume protocol: restore from an HF-layout save dir. LoRA
        runs restore adapter_model.msgpack over the current base weights."""
        from flax import serialization

        adapter_path = os.path.join(checkpoint_dir, "adapter_model.msgpack")
        if os.path.exists(adapter_path):
            if current is None:
                raise ValueError("adapter-only checkpoint needs current base variables")
            from nexus_tpu.models.lora import apply_adapter_params

            with open(adapter_path, "rb") as f:
                adapters = serialization.msgpack_restore(f.read())
            return {**current, "params": apply_adapter_params(current["params"], adapters)}
        from nexus_tpu.training.checkpoint import restore_flax_msgpack

        target = current or jax.eval_shape(lambda: self.init_variables(jax.random.PRNGKey(0)))
        return restore_flax_msgpack(checkpoint_dir, target)

    @classmethod
    def from_pretrained(cls, model_dir: str, model_args=None) -> "BiMultimodalEmbedderModel":
        from flax import serialization

        with open(os.path.join(model_dir, "config.json")) as f:
            cfg_dict = json.load(f)
        backbone_type = cfg_dict.pop("model_type", "nexus-vlm")
        grid_thw = tuple(cfg_dict.pop("grid_thw", (1, 16, 16)))
        if backbone_type in ("qwen3-vl", "qwen3.5"):
            from nexus_tpu.models.qwen3_vl import Qwen3VLConfig

            config = Qwen3VLConfig.from_dict(cfg_dict)
        elif backbone_type in ("qwen2-vl", "qwen2.5-vl"):
            from nexus_tpu.models.qwen2_vl import Qwen2VLConfig

            config = Qwen2VLConfig.from_dict(cfg_dict)
        elif "architectures" in cfg_dict or "vision_config" in cfg_dict:
            # a raw HF Qwen-VL-family checkpoint dir: convert the torch weights
            return cls.from_hf_pretrained(model_dir, model_args)
        else:
            config = VLMConfig.from_dict(cfg_dict)
        nexus_cfg = os.path.join(model_dir, "nexus_embedder_config.json")
        if model_args is None and os.path.exists(nexus_cfg):
            with open(nexus_cfg) as f:
                d = json.load(f)
                d.pop("multimodal", None)
                model_args = TextEmbedderModelArguments.from_dict(d)
        model = cls(config, model_args, backbone_type=backbone_type, grid_thw=grid_thw)
        flax_path = os.path.join(model_dir, "flax_model.msgpack")
        if os.path.exists(flax_path):
            target = jax.eval_shape(lambda: model.init_variables(jax.random.PRNGKey(0)))
            with open(flax_path, "rb") as f:
                model.variables = serialization.from_bytes(target, f.read())
        return model
