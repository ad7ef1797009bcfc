"""Int8 W8A8 quantized inference for the BERT-family encoders.

The v5e MXU runs int8 x int8 -> int32 at 394 TOPS — 2x its bf16 peak — so
a post-training-quantized encode path raises the serving throughput ceiling
above anything bf16 can reach (the reference has no quantized path; its
TensorRT engines COULD, but the shipped configs run fp16 —
Nexus/inference/embedder/text_retrieval/base.py builds fp16 sessions).

Recipe (the standard dynamic W8A8):
- weights: per-output-channel symmetric int8 (`scale = amax/127` over the
  input axis), converted OFFLINE by `quantize_bert_params`;
- activations: per-token dynamic symmetric int8, computed inline (one
  abs-max + rescale per projection — cheap VPU work XLA fuses into the
  surrounding elementwise ops);
- accumulation in int32, dequantized as `y * s_act * s_w` in f32;
- everything that is not a projection GEMM (embeddings, LayerNorms,
  attention softmax, pooler) stays in the model dtype.

Only the six projection/FFN Denses quantize (query/key/value | fused qkv,
attention_output_dense, intermediate_dense, output_dense) — they carry
~2/3 of encode FLOPs at L=128. Quantized mode composes with every
attention path: xla / pallas flash, and `attention_impl='fused'` runs the
int8 full-layer megakernel (ops/fused_encoder.py::fused_encoder_layer_int8
— the same per-token quantization inside one Pallas program per row, with
the int8 GEMMs on the MXU at 2x bf16 peak).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# module names whose 'kernel' leaves quantize, per trunk family
QUANT_DENSE_NAMES = frozenset({  # BertSelfAttention/BertLayer
    "query", "key", "value", "qkv",
    "attention_output_dense", "intermediate_dense", "output_dense",
})
QUANT_LLAMA_NAMES = frozenset({  # LlamaAttention/LlamaMLP (+ Qwen trunks)
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
})


class QuantDense(nn.Module):
    """Drop-in Dense with an int8 kernel + per-channel scale: int8 dynamic
    activation quant -> int8 x int8 MXU GEMM -> int32 -> f32 dequant."""

    features: int
    out_dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("kernel", nn.initializers.zeros,
                       (in_features, self.features), jnp.int8)
        s_w = self.param("scale", nn.initializers.ones,
                         (self.features,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32) if self.use_bias else 0.0)
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s_a = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * s_a * s_w + b).astype(self.out_dtype)


def _quantize_kernel(w: np.ndarray):
    """[.., in, out] f32 kernel -> (int8 kernel, [.., out] f32 scale).
    Per-output-channel symmetric; stacked layer dims pass through."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=-2)
    scale = np.maximum(amax, 1e-12) / 127.0
    wq = np.clip(np.round(w / scale[..., None, :]), -127, 127).astype(np.int8)
    return wq, scale.astype(np.float32)


def _quantize_tree(variables, names) -> dict:
    from flax.core import unfreeze

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if name in names and isinstance(child, dict) and "kernel" in child:
                wq, scale = _quantize_kernel(np.asarray(child["kernel"]))
                q = {"kernel": jnp.asarray(wq), "scale": jnp.asarray(scale)}
                if "bias" in child:
                    q["bias"] = jnp.asarray(np.asarray(child["bias"], np.float32))
                out[name] = q
            else:
                out[name] = walk(child)
        return out

    return walk(unfreeze(variables))


def quantize_bert_params(variables) -> dict:
    """Offline conversion: an fp BertEncoderModel variables tree -> the
    QuantDense tree (int8 kernels + scales; biases/everything else kept).
    Works on scanned (stacked) and unscanned layouts."""
    return _quantize_tree(variables, QUANT_DENSE_NAMES)


def quantize_llama_params(variables) -> dict:
    """Same conversion for the Llama/Qwen decoder trunks (halves the weight
    bytes of an LLM reranker/embedder on top of the 2x MXU rate)."""
    return _quantize_tree(variables, QUANT_LLAMA_NAMES)


# vision-tower subtrees, split off before the blanket text-trunk walk: the
# Qwen2.5-VL vision block reuses gate/up/down_proj NAMES, so an unscoped
# llama-names conversion would corrupt them. They are re-quantized (or kept
# fp) by their OWN path-scoped walk below.
_VLM_VISION_SUBTREES = ("visual", "vision_tower")

# the Qwen vision blocks' projection GEMMs (both 2-VL fc1/fc2 and 2.5-VL
# gated-MLP names); patch_embed + PatchMerger (merger_fc*) stay fp
QUANT_VISION_NAMES = frozenset({
    "qkv", "attn_proj", "fc1", "fc2", "gate_proj", "up_proj", "down_proj",
})


def quantize_vlm_params(variables, include_vision: bool = False) -> dict:
    """Qwen-VL / nexus-vlm backbones: quantize the TEXT trunk's
    projection/FFN kernels (the bulk of the weights — e.g. ~1.5B of
    Qwen2-VL-2B). With ``include_vision``, the vision tower's block
    projections quantize too via a PATH-scoped walk over the visual
    subtree only — the r4 verdict's fix for the gate/up/down_proj name
    collision that name-based exclusion used to sidestep by keeping the
    whole tower fp. The projector/merger stays fp either way."""
    params = dict(variables["params"])
    vision = {k: params.pop(k) for k in _VLM_VISION_SUBTREES if k in params}
    rest = dict(variables)
    rest["params"] = params
    out = _quantize_tree(rest, QUANT_LLAMA_NAMES)
    if include_vision:
        vision = {k: _quantize_tree(v, QUANT_VISION_NAMES)
                  for k, v in vision.items()}
    out["params"] = {**dict(out["params"]), **vision}
    return out


def quantize_model(model) -> None:
    """Engine-side dispatch: convert a wrapped embedder/reranker model to
    int8 IN PLACE (variables + config.quantized). Dispatches on the actual
    config CLASS, not attribute names — BiDecoderOnlyEmbedderModel aliases
    ``bert_config`` to its LlamaConfig for the save path, so attribute
    probing alone mis-routes decoders to the BERT converter. Multimodal
    backbones (vlm_config with a .text LlamaConfig) route to the
    text-trunk-only converter."""
    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.models.llama import LlamaConfig

    vlm = getattr(model, "vlm_config", None)
    text_cfg = getattr(vlm, "text", None) if vlm is not None else None
    if isinstance(text_cfg, LlamaConfig):
        if getattr(text_cfg, "lora_rank", 0) > 0:
            raise ValueError(
                "quantized serving is incompatible with live LoRA adapters — "
                "export a merged checkpoint first (save_merged_model)")
        # Qwen vision towers carry a `quantized` flag and QuantDense-aware
        # blocks -> their projections quantize too (path-scoped); LLaVA's
        # ViT tower (flax MHA with 3D kernels) stays fp
        vis_cfg = getattr(vlm, "vision", None)
        include_vision = hasattr(vis_cfg, "quantized")
        model.variables = quantize_vlm_params(
            model.variables, include_vision=include_vision)
        text_cfg.quantized = True
        if include_vision:
            vis_cfg.quantized = True
        return

    cfg = getattr(model, "llama_config", None)
    if cfg is None:
        cfg = getattr(model, "bert_config", None)
    if isinstance(cfg, LlamaConfig):
        if getattr(cfg, "lora_rank", 0) > 0:
            raise ValueError(
                "quantized serving is incompatible with live LoRA adapters — "
                "export a merged checkpoint first (save_merged_model)")
        model.variables = quantize_llama_params(model.variables)
    elif isinstance(cfg, BertConfig):
        model.variables = quantize_bert_params(model.variables)
    else:
        raise ValueError(
            "quantized=True needs a BERT-family or decoder (Llama/Qwen) "
            f"checkpoint; model carries config {type(cfg).__name__}")
    cfg.quantized = True
