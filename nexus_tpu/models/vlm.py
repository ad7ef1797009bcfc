"""VLM backbone: ViT vision tower -> projector -> causal LM trunk
(Qwen-VL-class architecture; reference role: the backbones of
Nexus/modules/multimodal.py's registry).

Token-merge contract (static shapes for TPU): every sample reserves
`num_image_tokens` positions per image slot. The processor emits
`image_slot_mask` [B, L] marking those positions; the model scatters the
projected vision features into the token-embedding stream there. Samples
without an image keep their placeholder positions masked out of attention.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nexus_tpu.config import AbsArguments
from nexus_tpu.models.llama import LlamaConfig, LlamaModel
from nexus_tpu.models.vit import ViTConfig, ViTEncoder

Array = jnp.ndarray


@dataclass
class VLMConfig(AbsArguments):
    vision: ViTConfig = None
    text: LlamaConfig = None
    num_image_tokens: int = 64  # projected tokens per image (after pooling)
    projector_hidden: int = 0  # 0 -> single linear

    @classmethod
    def tiny(cls) -> "VLMConfig":
        return cls(
            vision=ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=128, use_cls_token=False),
            text=LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, max_position_embeddings=256),
            num_image_tokens=16,
        )

    @staticmethod
    def from_dict(d: dict) -> "VLMConfig":
        d = dict(d)
        if isinstance(d.get("vision"), dict):
            d["vision"] = ViTConfig.from_dict(d["vision"])
        if isinstance(d.get("text"), dict):
            d["text"] = LlamaConfig.from_dict(d["text"])
        return VLMConfig(**{k: v for k, v in d.items() if k in VLMConfig.__dataclass_fields__})


class VLMBackbone(nn.Module):
    """Multimodal causal encoder returning last_hidden_state."""

    config: VLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    def _pool_vision_tokens(self, feats: Array) -> Array:
        """[B, T, Dv] -> [B, num_image_tokens, Dv] by average-pooling groups
        of adjacent patches (spatial merge, the Qwen-VL patch-merger role)."""
        c = self.config
        b, t, d = feats.shape
        if c.vision.use_cls_token:
            feats = feats[:, 1:]
            t -= 1
        group = max(t // c.num_image_tokens, 1)
        usable = c.num_image_tokens * group
        feats = feats[:, :usable].reshape(b, c.num_image_tokens, group, d)
        return jnp.mean(feats, axis=2)

    @nn.compact
    def __call__(
        self,
        input_ids: Array,  # [B, L]
        attention_mask: Array,  # [B, L]
        pixel_values: Optional[Array] = None,  # [B, N_img, H, W, C]
        image_slot_mask: Optional[Array] = None,  # [B, L] 1 where image tokens go
        train: bool = False,
    ):
        c = self.config
        embed = nn.Embed(c.text.vocab_size, c.text.hidden_size, dtype=self.dtype, name="embed_tokens")
        x = embed(input_ids)  # [B, L, D]
        if pixel_values is not None and image_slot_mask is not None:
            b, n_img = pixel_values.shape[:2]
            flat_pix = pixel_values.reshape(b * n_img, *pixel_values.shape[2:])
            feats = ViTEncoder(c.vision, dtype=self.dtype, name="vision_tower")(flat_pix, train)
            tokens = self._pool_vision_tokens(feats)  # [B*N, K, Dv]
            if c.projector_hidden:
                tokens = nn.Dense(c.projector_hidden, dtype=self.dtype, name="proj_fc1")(tokens)
                tokens = nn.gelu(tokens)
            tokens = nn.Dense(c.text.hidden_size, dtype=self.dtype, name="projector")(tokens)
            tokens = tokens.reshape(b, n_img * c.num_image_tokens, c.text.hidden_size)
            # scatter projected tokens into the slot positions, in order
            slot_order = jnp.cumsum(image_slot_mask, axis=1) - 1  # index among slots
            slot_order = jnp.clip(slot_order, 0, tokens.shape[1] - 1)
            gathered = jnp.take_along_axis(tokens, slot_order[..., None], axis=1)
            x = jnp.where(image_slot_mask[..., None] > 0, gathered.astype(x.dtype), x)

        # run the causal trunk over the merged embedding stream
        trunk = LlamaModel(c.text, dtype=self.dtype, name="trunk")
        out = trunk(input_ids=input_ids, attention_mask=attention_mask,
                    inputs_embeds=x, train=train)
        return {"last_hidden_state": out["last_hidden_state"]}
