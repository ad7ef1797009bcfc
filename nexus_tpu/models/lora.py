"""LoRA (low-rank adaptation) for linen Dense layers.

Functional design (parity role: the PEFT LoraConfig wrapping in
Nexus/training/embedder/text_retrieval/decoder_only/load_model.py:13-121):
- `LoRADense` — drop-in Dense with frozen base kernel plus trainable A/B
  low-rank factors in a separate "lora" param prefix;
- `lora_param_filter` — optax mask so only lora_* (and optionally other)
  params train;
- `merge_lora_params` — fold A·B back into the base kernels for export
  (save_merged_model parity).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LoRADense(nn.Module):
    """Dense with optional LoRA: y = x W + b + (alpha/r) x A B."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype, name="base")(x)
        if self.lora_rank > 0:
            a = self.param(
                "lora_A",
                nn.initializers.normal(stddev=0.02),
                (x.shape[-1], self.lora_rank),
                jnp.float32,
            )
            b = self.param("lora_B", nn.initializers.zeros, (self.lora_rank, self.features), jnp.float32)
            scale = self.lora_alpha / self.lora_rank
            y = y + (x.astype(jnp.float32) @ a @ b * scale).astype(y.dtype)
        return y


def lora_param_filter(params: dict) -> dict:
    """Pytree of bools: True for LoRA params (trainable), False elsewhere.
    Use with optax.masked / multi_transform for adapter-only training."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_lora(path) -> bool:
        return any(getattr(k, "key", None) in ("lora_A", "lora_B") for k in path)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(lambda path, _: is_lora(path), params)


def merge_lora_params(params: dict, alpha: float = 16.0) -> dict:
    """Fold every {base, lora_A, lora_B} triple into a plain Dense kernel."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "lora_A" in tree and "lora_B" in tree and "base" in tree:
            rank = np.asarray(tree["lora_A"]).shape[-1]
            scale = alpha / rank
            kernel = np.asarray(tree["base"]["kernel"], np.float32) + (
                np.asarray(tree["lora_A"], np.float32) @ np.asarray(tree["lora_B"], np.float32) * scale
            )
            merged = {"kernel": jnp.asarray(kernel, tree["base"]["kernel"].dtype)}
            if "bias" in tree["base"]:
                merged["bias"] = tree["base"]["bias"]
            return merged
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)


def lora_dense(config, features: int, name: str, use_bias: bool, dtype,
               plain: bool = False) -> nn.Module:
    """Dense factory shared by the Llama / Qwen-VL text trunks: returns a
    LoRADense when ``config.lora_rank > 0`` (adapter training), an int8
    QuantDense when ``config.quantized`` (serving), else a plain Dense.
    ``config`` is any object with lora_rank / lora_alpha attributes
    (LlamaConfig). ``plain=True`` opts out of LoRA (MLP projections keep
    their historical adapter-free tree) but still honors quantized."""
    rank = 0 if plain else getattr(config, "lora_rank", 0)
    if getattr(config, "quantized", False):
        if getattr(config, "lora_rank", 0) > 0:
            raise ValueError(
                "quantized serving is incompatible with live LoRA adapters — "
                "export a merged checkpoint first (save_merged_model)")
        from nexus_tpu.models.quantize import QuantDense

        return QuantDense(features, out_dtype=dtype, use_bias=use_bias, name=name)
    if rank > 0:
        return LoRADense(features, use_bias=use_bias, dtype=dtype,
                         lora_rank=rank, lora_alpha=config.lora_alpha, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def graft_lora_init(converted_params: dict, init_params: dict) -> dict:
    """Overlay converted base weights onto a fresh init that contains
    lora_A/lora_B leaves: every leaf present in ``converted_params`` wins,
    leaves only in ``init_params`` (the adapters) keep their init values."""
    def graft(conv, ini):
        if isinstance(ini, dict):
            if "base" in ini and isinstance(conv, dict) and "kernel" in conv:
                # plain Dense checkpoint grafted onto a LoRA net: the kernel
                # (and bias) nest under the frozen 'base' child
                out = dict(ini)
                out["base"] = graft(conv, ini["base"])
                return out
            out = {}
            for k, v in ini.items():
                if isinstance(conv, dict) and k in conv:
                    out[k] = graft(conv[k], v)
                else:
                    out[k] = v  # lora_A/lora_B from init
            return out
        return conv if conv is not None else ini

    return graft(converted_params, init_params)


def apply_adapter_params(params: dict, adapters: dict) -> dict:
    """Pure overlay of a saved adapter sub-tree (lora_A/lora_B leaves) onto a
    full parameter tree; returns a new tree."""
    def walk(p, tree):
        if not isinstance(p, dict):
            return p
        out = {}
        for k, v in p.items():
            if k in ("lora_A", "lora_B") and isinstance(tree, dict) and k in tree:
                out[k] = jnp.asarray(tree[k])
            elif isinstance(tree, dict) and k in tree:
                out[k] = walk(v, tree[k])
            else:
                out[k] = v
        return out

    return walk(params, adapters)


def extract_lora_params(params: dict) -> dict:
    """The adapter-only sub-tree (for saving adapters separately)."""
    def walk(tree):
        if not isinstance(tree, dict):
            return None
        if "lora_A" in tree and "lora_B" in tree:
            return {"lora_A": tree["lora_A"], "lora_B": tree["lora_B"]}
        out = {k: walk(v) for k, v in tree.items()}
        out = {k: v for k, v in out.items() if v}
        return out or None

    return walk(params) or {}
