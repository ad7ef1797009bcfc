"""Vision Transformer encoder in Flax — the vision tower for multimodal
embedders (reference role: the vision side of the Qwen-VL/CLIP backbones
loaded by Nexus/modules/multimodal.py:172-512).

Patchify with a Conv (one big matmul on the MXU), prepend an optional CLS
token, pre-norm transformer blocks with scan-over-layers, bf16-ready.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nexus_tpu.config import AbsArguments

Array = jnp.ndarray


@dataclass
class ViTConfig(AbsArguments):
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-6
    use_cls_token: bool = True
    num_channels: int = 3
    # 'xla' keeps flax's dense attention; 'pallas' routes through the flash
    # kernel (ops/flash_attention.py). Measured on the Qwen towers
    # (BENCH_NOTES r5): XLA attention wins at 256-1024 patch grids on v5e,
    # so 'fused' stays on the dense path here; flash is the opt-in for
    # multi-frame / >=4k-token grids. Param tree is identical across impls
    # (the flash path plugs in via attention_fn).
    attention_impl: str = "xla"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTBlock(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        attn_kw = {}
        if c.attention_impl == "pallas":
            from nexus_tpu.ops.flash_attention import flash_vision_attention

            def _flash_fn(query, key, value, **_kw):  # [B, L, H, Dh]
                return flash_vision_attention(query, key, value)

            attn_kw["attention_fn"] = _flash_fn
        attn = nn.MultiHeadDotProductAttention(
            num_heads=c.num_attention_heads, qkv_features=c.hidden_size,
            dtype=self.dtype, deterministic=True, name="attn", **attn_kw,
        )(h, h)
        x = x + attn
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class _ScannedViTBlock(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return ViTBlock(self.config, dtype=self.dtype, name="block")(x), None


class ViTEncoder(nn.Module):
    """[B, H, W, C] pixels -> [B, T(+1), D] patch features."""

    config: ViTConfig
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True

    @nn.compact
    def __call__(self, pixels: Array, train: bool = False):
        c = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, -1, c.hidden_size)  # [B, T, D]
        t = x.shape[1]
        if c.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.hidden_size)), x], axis=1)
            t += 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, t, c.hidden_size), jnp.float32
        )
        x = x + pos.astype(self.dtype)
        if self.scan_layers:
            Scanned = nn.scan(
                _ScannedViTBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_hidden_layers,
            )
            x, _ = Scanned(c, dtype=self.dtype, name="blocks")(x, None)
        else:
            for i in range(c.num_hidden_layers):
                x = ViTBlock(c, dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="post_norm")(x)
        return x.astype(self.dtype)
