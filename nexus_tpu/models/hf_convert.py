"""HuggingFace -> Flax weight conversion for BERT-family encoders.

Loads either a torch `BertModel` state_dict (in-memory) or a local HF
checkpoint directory (config.json + *.safetensors / pytorch_model.bin) and
produces params for `nexus_tpu.models.bert.BertEncoderModel`.

No torch is needed at serve time — conversion is an offline step; the
resulting params are plain jnp arrays (optionally bf16-cast).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.bert import BertConfig


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_hf_state_dict(model_dir: str) -> dict:
    """Flat state dict from a local HF checkpoint dir: every *.safetensors
    shard merged, else pytorch_model.bin. The one loading path shared by
    all converters."""
    st_files = [f for f in sorted(os.listdir(model_dir)) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file

        sd: dict = {}
        for f in st_files:
            sd.update(load_file(os.path.join(model_dir, f)))
        return sd
    import torch

    return torch.load(
        os.path.join(model_dir, "pytorch_model.bin"), map_location="cpu", weights_only=True
    )


def torch_bert_to_flax(
    state_dict: Dict[str, "np.ndarray"], config: BertConfig, dtype=jnp.float32,
    scan_layers: bool = True, plain_layers: int = 0,
) -> dict:
    """Map a HF BertModel state_dict onto BertEncoderModel params.

    With ``scan_layers`` the per-layer trees are stacked on axis 0 for the
    lax.scan layer loop (see BertEncoderModel.scan_layers). When
    ``config.fused_qkv`` the three projection matrices pack into one
    [h, 3h] kernel (single fat MXU GEMM at inference)."""
    sd = {
        k.removeprefix("bert.").removeprefix("roberta."): _t(v)
        for k, v in state_dict.items()
    }

    def dense(prefix):
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.weight"].T, dtype),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype),
        }

    def fused_qkv(p):
        kernels = [sd[f"{p}.attention.self.{n}.weight"].T for n in ("query", "key", "value")]
        biases = [sd[f"{p}.attention.self.{n}.bias"] for n in ("query", "key", "value")]
        return {
            "kernel": jnp.asarray(np.concatenate(kernels, axis=1), dtype),
            "bias": jnp.asarray(np.concatenate(biases), dtype),
        }

    def layernorm(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(sd["embeddings.word_embeddings.weight"], dtype)},
            "position_embeddings": {"embedding": jnp.asarray(sd["embeddings.position_embeddings.weight"], dtype)},
            "token_type_embeddings": {"embedding": jnp.asarray(sd["embeddings.token_type_embeddings.weight"], dtype)},
            "LayerNorm": layernorm("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention_self": (
                {"qkv": fused_qkv(p)}
                if config.fused_qkv
                else {
                    "query": dense(f"{p}.attention.self.query"),
                    "key": dense(f"{p}.attention.self.key"),
                    "value": dense(f"{p}.attention.self.value"),
                }
            ),
            "attention_output_dense": dense(f"{p}.attention.output.dense"),
            "attention_output_LayerNorm": layernorm(f"{p}.attention.output.LayerNorm"),
            "intermediate_dense": dense(f"{p}.intermediate.dense"),
            "output_dense": dense(f"{p}.output.dense"),
            "output_LayerNorm": layernorm(f"{p}.output.LayerNorm"),
        }
    if config.add_pooling_layer and "pooler.dense.weight" in sd:
        params["pooler_dense"] = dense("pooler.dense")
    if scan_layers:
        from nexus_tpu.models.bert import stack_layer_params

        params = stack_layer_params(params, config.num_hidden_layers, plain_layers)
    return {"params": params}


def load_hf_bert(model_dir: str, dtype=jnp.float32, add_pooling_layer: bool = True,
                 scan_layers: bool = True, plain_layers: int = 0):
    """Load a local HF BERT checkpoint directory into (BertConfig, variables).

    Reads config.json + model.safetensors (preferred) or pytorch_model.bin.
    """
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    config = BertConfig.from_hf(cfg_dict)
    config.add_pooling_layer = add_pooling_layer

    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no model weights found under {model_dir}")
    return config, torch_bert_to_flax(sd, config, dtype=dtype, scan_layers=scan_layers,
                                      plain_layers=plain_layers)


def torch_llama_to_flax(state_dict, config, dtype=jnp.float32, scan_layers: bool = True,
                        lora: bool = False) -> dict:
    """Map a HF LlamaModel/Qwen2Model state_dict onto LlamaModel params.
    With ``lora=True`` the dense kernels nest under a 'base' child
    (LoRADense layout) so adapters can be trained on top."""
    sd = {k.removeprefix("model."): _t(v) for k, v in state_dict.items()}

    def dense(prefix, wrap_lora):
        d = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T, dtype)}
        if f"{prefix}.bias" in sd:
            d["bias"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
        return {"base": d} if wrap_lora else d

    def norm(prefix):
        return {"weight": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32)}

    layers = []
    for i in range(config.num_hidden_layers):
        p = f"layers.{i}"
        attn = {
            "q_proj": dense(f"{p}.self_attn.q_proj", lora),
            "k_proj": dense(f"{p}.self_attn.k_proj", lora),
            "v_proj": dense(f"{p}.self_attn.v_proj", lora),
            "o_proj": dense(f"{p}.self_attn.o_proj", lora),
        }
        if f"{p}.self_attn.q_norm.weight" in sd:  # Qwen3 per-head q/k norms
            attn["q_norm"] = norm(f"{p}.self_attn.q_norm")
            attn["k_norm"] = norm(f"{p}.self_attn.k_norm")
        layers.append({
            "self_attn": attn,
            "mlp": {
                "gate_proj": dense(f"{p}.mlp.gate_proj", False),
                "up_proj": dense(f"{p}.mlp.up_proj", False),
                "down_proj": dense(f"{p}.mlp.down_proj", False),
            },
            "input_layernorm": norm(f"{p}.input_layernorm"),
            "post_attention_layernorm": norm(f"{p}.post_attention_layernorm"),
        })
    params = {
        "embed_tokens": {"embedding": jnp.asarray(sd["embed_tokens.weight"], dtype)},
        "norm": norm("norm"),
    }
    if scan_layers:
        import jax as _jax

        params["layers"] = {"layer": _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)}
    else:
        for i, lp in enumerate(layers):
            params[f"layer_{i}"] = lp
    if "lm_head.weight" in {k for k in state_dict}:
        params["lm_head"] = {"kernel": jnp.asarray(_t(state_dict["lm_head.weight"]).T, dtype)}
    return {"params": params}


def torch_qwen2vl_to_flax(state_dict, config, dtype=jnp.float32, scan_layers: bool = True,
                          lora: bool = False) -> dict:
    """Map a HF Qwen2VLModel / Qwen2VLForConditionalGeneration state_dict
    onto Qwen2VLBackbone params (vision tower + merger + Qwen2 text trunk).

    The Conv3d patch embed becomes a Dense kernel over the processor's
    flattened [C*T*P*P] patch layout (kernel == stride, so they are the
    same linear map)."""
    import jax as _jax

    sd = {k.removeprefix("model."): _t(v) for k, v in state_dict.items()}
    vis_sd = {k.removeprefix("visual."): v for k, v in sd.items() if k.startswith("visual.")}
    txt_sd = {
        k.removeprefix("language_model."): v
        for k, v in sd.items()
        if k.startswith("language_model.")
    }
    if not txt_sd:  # plain Qwen2VLModel layout (layers.* at top level)
        txt_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}

    def dense(m, prefix):
        d = {"kernel": jnp.asarray(m[f"{prefix}.weight"].T, dtype)}
        if f"{prefix}.bias" in m:
            d["bias"] = jnp.asarray(m[f"{prefix}.bias"], dtype)
        return d

    def ln(m, prefix):
        return {
            "scale": jnp.asarray(m[f"{prefix}.weight"], jnp.float32),
            "bias": jnp.asarray(m[f"{prefix}.bias"], jnp.float32),
        }

    def rms(m, prefix):
        return {"weight": jnp.asarray(m[f"{prefix}.weight"], jnp.float32)}

    is_25 = getattr(config, "variant", "qwen2-vl") == "qwen2.5-vl"
    vc = config.vision
    pe = vis_sd["patch_embed.proj.weight"]  # [embed, C, T, P, P]
    visual = {
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype)},
        "ln_q": (rms if is_25 else ln)(vis_sd, "merger.ln_q"),
        "merger_fc1": dense(vis_sd, "merger.mlp.0"),
        "merger_fc2": dense(vis_sd, "merger.mlp.2"),
    }
    blocks = []
    for i in range(vc.depth):
        p = f"blocks.{i}"
        if is_25:
            blocks.append({
                "norm1": rms(vis_sd, f"{p}.norm1"),
                "norm2": rms(vis_sd, f"{p}.norm2"),
                "qkv": dense(vis_sd, f"{p}.attn.qkv"),
                "attn_proj": dense(vis_sd, f"{p}.attn.proj"),
                "gate_proj": dense(vis_sd, f"{p}.mlp.gate_proj"),
                "up_proj": dense(vis_sd, f"{p}.mlp.up_proj"),
                "down_proj": dense(vis_sd, f"{p}.mlp.down_proj"),
            })
        else:
            blocks.append({
                "norm1": ln(vis_sd, f"{p}.norm1"),
                "norm2": ln(vis_sd, f"{p}.norm2"),
                "qkv": dense(vis_sd, f"{p}.attn.qkv"),
                "attn_proj": dense(vis_sd, f"{p}.attn.proj"),
                "fc1": dense(vis_sd, f"{p}.mlp.fc1"),
                "fc2": dense(vis_sd, f"{p}.mlp.fc2"),
            })
    if scan_layers:
        visual["blocks"] = {"block": _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)}
    else:
        for i, bp in enumerate(blocks):
            visual[f"block_{i}"] = bp

    text = torch_llama_to_flax(txt_sd, config.text, dtype=dtype, scan_layers=scan_layers,
                               lora=lora)["params"]
    text.pop("lm_head", None)  # embedder use: no LM head
    return {"params": {**text, "visual": visual}}


def load_hf_qwen2vl(model_dir: str, dtype=jnp.float32, scan_layers: bool = True,
                    lora: bool = False):
    """Load a local HF Qwen2-VL checkpoint dir into (Qwen2VLConfig, variables)."""
    from nexus_tpu.models.qwen2_vl import Qwen2VLConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    config = Qwen2VLConfig.from_hf(cfg_dict)

    sd = load_hf_state_dict(model_dir)
    return config, torch_qwen2vl_to_flax(sd, config, dtype=dtype, scan_layers=scan_layers,
                                         lora=lora)


def torch_qwen3vl_to_flax(state_dict, config, dtype=jnp.float32, scan_layers: bool = True,
                          lora: bool = False) -> dict:
    """Map a HF Qwen3VLModel / Qwen3VLForConditionalGeneration state_dict
    onto Qwen3VLBackbone params: deepstack vision tower (learned pos-embed
    table + per-tap post-shuffle mergers) and the Qwen3 text trunk split into
    the 'layers_deep' (first len(deepstack) layers, injection scan) and
    'layers' (remainder) stacks."""
    import jax as _jax

    sd = {k.removeprefix("model."): _t(v) for k, v in state_dict.items()}
    vis_sd = {k.removeprefix("visual."): v for k, v in sd.items() if k.startswith("visual.")}
    txt_sd = {
        k.removeprefix("language_model."): v
        for k, v in sd.items()
        if k.startswith("language_model.")
    }
    if not txt_sd:
        txt_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}

    def dense(m, prefix):
        d = {"kernel": jnp.asarray(m[f"{prefix}.weight"].T, dtype)}
        if f"{prefix}.bias" in m:
            d["bias"] = jnp.asarray(m[f"{prefix}.bias"], dtype)
        return d

    def ln(m, prefix):
        return {
            "scale": jnp.asarray(m[f"{prefix}.weight"], jnp.float32),
            "bias": jnp.asarray(m[f"{prefix}.bias"], jnp.float32),
        }

    def rms(m, prefix):
        return {"weight": jnp.asarray(m[f"{prefix}.weight"], jnp.float32)}

    vc = config.vision
    pe = vis_sd["patch_embed.proj.weight"]  # [D, C, T, P, P]
    visual = {
        "patch_embed": {
            "kernel": jnp.asarray(pe.reshape(pe.shape[0], -1).T, dtype),
            "bias": jnp.asarray(vis_sd["patch_embed.proj.bias"], dtype),
        },
        "pos_embed": jnp.asarray(vis_sd["pos_embed.weight"], jnp.float32),
        "merger": {
            "norm": ln(vis_sd, "merger.norm"),
            "linear_fc1": dense(vis_sd, "merger.linear_fc1"),
            "linear_fc2": dense(vis_sd, "merger.linear_fc2"),
        },
    }
    for j in range(len(vc.deepstack_visual_indexes)):
        visual[f"deepstack_merger_{j}"] = {
            "norm": ln(vis_sd, f"deepstack_merger_list.{j}.norm"),
            "linear_fc1": dense(vis_sd, f"deepstack_merger_list.{j}.linear_fc1"),
            "linear_fc2": dense(vis_sd, f"deepstack_merger_list.{j}.linear_fc2"),
        }
    blocks = []
    for i in range(vc.depth):
        p = f"blocks.{i}"
        blocks.append({
            "norm1": ln(vis_sd, f"{p}.norm1"),
            "norm2": ln(vis_sd, f"{p}.norm2"),
            "qkv": dense(vis_sd, f"{p}.attn.qkv"),
            "attn_proj": dense(vis_sd, f"{p}.attn.proj"),
            "linear_fc1": dense(vis_sd, f"{p}.mlp.linear_fc1"),
            "linear_fc2": dense(vis_sd, f"{p}.mlp.linear_fc2"),
        })
    stack = lambda ls: _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)  # noqa: E731
    if scan_layers:
        visual["blocks"] = {"block": stack(blocks)}
    else:
        for i, bp in enumerate(blocks):
            visual[f"block_{i}"] = bp

    tc = config.text
    wrap = (lambda d: {"base": d}) if lora else (lambda d: d)
    layers = []
    for i in range(tc.num_hidden_layers):
        p = f"layers.{i}"
        layers.append({
            "self_attn": {
                "q_proj": wrap(dense(txt_sd, f"{p}.self_attn.q_proj")),
                "k_proj": wrap(dense(txt_sd, f"{p}.self_attn.k_proj")),
                "v_proj": wrap(dense(txt_sd, f"{p}.self_attn.v_proj")),
                "o_proj": wrap(dense(txt_sd, f"{p}.self_attn.o_proj")),
                "q_norm": rms(txt_sd, f"{p}.self_attn.q_norm"),
                "k_norm": rms(txt_sd, f"{p}.self_attn.k_norm"),
            },
            "mlp": {
                "gate_proj": dense(txt_sd, f"{p}.mlp.gate_proj"),
                "up_proj": dense(txt_sd, f"{p}.mlp.up_proj"),
                "down_proj": dense(txt_sd, f"{p}.mlp.down_proj"),
            },
            "input_layernorm": rms(txt_sd, f"{p}.input_layernorm"),
            "post_attention_layernorm": rms(txt_sd, f"{p}.post_attention_layernorm"),
        })
    n_deep = len(vc.deepstack_visual_indexes)
    params = {
        "embed_tokens": {"embedding": jnp.asarray(txt_sd["embed_tokens.weight"], dtype)},
        "norm": rms(txt_sd, "norm"),
        "visual": visual,
    }
    if scan_layers:
        if n_deep:
            params["layers_deep"] = {"layer": stack(layers[:n_deep])}
        params["layers"] = {"layer": stack(layers[n_deep:])}
    else:
        for i, lp in enumerate(layers):
            params[f"layer_{i}"] = lp
    return {"params": params}


def qwen3vl_binary_score_vector(state_dict, yes_token_id: int, no_token_id: int):
    """w_yes - w_no from the LM head — the yes/no binary scoring vector the
    MMEB reranker applies to the last hidden state (reference:
    Nexus/evaluation/mmeb_v2/qwen3_vl_reranker.py get_binary_linear)."""
    key = "lm_head.weight"
    if key not in state_dict:  # tied embeddings fall back to the embed table
        key = next(k for k in state_dict if k.endswith("embed_tokens.weight"))
    w = _t(state_dict[key])
    return np.asarray(w[yes_token_id] - w[no_token_id], np.float32)


def load_hf_qwen3vl(model_dir: str, dtype=jnp.float32, scan_layers: bool = True,
                    lora: bool = False):
    """Load a local HF Qwen3-VL checkpoint dir into (Qwen3VLConfig, variables)."""
    from nexus_tpu.models.qwen3_vl import Qwen3VLConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    config = Qwen3VLConfig.from_hf(cfg_dict)

    sd = load_hf_state_dict(model_dir)
    return config, torch_qwen3vl_to_flax(sd, config, dtype=dtype, scan_layers=scan_layers,
                                         lora=lora)


def torch_llava_next_to_flax(state_dict, config, dtype=jnp.float32, scan_layers: bool = True) -> dict:
    """Map a HF LlavaNextForConditionalGeneration state_dict onto
    LlavaNextBackbone params (CLIP tower + projector + image_newline + Llama
    trunk). Only the first `config.feature_depth` vision layers convert —
    LLaVA extracts hidden_states[vision_feature_layer], so deeper layers
    never run (one less layer of FLOPs than HF, which computes then discards
    the final layer)."""
    import jax as _jax

    sd = {k.removeprefix("model."): _t(v) for k, v in state_dict.items()}
    vt = "vision_tower.vision_model"

    def dense(prefix):
        d = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T, dtype)}
        if f"{prefix}.bias" in sd:
            d["bias"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
        return d

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    tower = {
        # torch Conv2d [D, C, k, k] -> flax [k, k, C, D]
        "patch_embedding": {
            "kernel": jnp.asarray(
                sd[f"{vt}.embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0), dtype
            )
        },
        "class_embedding": jnp.asarray(sd[f"{vt}.embeddings.class_embedding"], jnp.float32),
        "position_embedding": jnp.asarray(
            sd[f"{vt}.embeddings.position_embedding.weight"], jnp.float32
        ),
        "pre_layrnorm": ln(f"{vt}.pre_layrnorm"),
    }
    layers = []
    for i in range(config.feature_depth):
        p = f"{vt}.encoder.layers.{i}"
        layers.append({
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "self_attn": {
                "q_proj": dense(f"{p}.self_attn.q_proj"),
                "k_proj": dense(f"{p}.self_attn.k_proj"),
                "v_proj": dense(f"{p}.self_attn.v_proj"),
                "out_proj": dense(f"{p}.self_attn.out_proj"),
            },
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
        })
    if scan_layers:
        tower["layers"] = {"layer": _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)}
    else:
        for i, lp in enumerate(layers):
            tower[f"layer_{i}"] = lp

    lm_sd = {
        k.removeprefix("language_model."): v
        for k, v in sd.items()
        if k.startswith("language_model.")
    }
    lm = torch_llama_to_flax(lm_sd, config.text, dtype=dtype, scan_layers=scan_layers)
    lm["params"].pop("lm_head", None)  # embedder use — no LM head

    params = {
        "vision_tower": tower,
        "projector_linear_1": dense("multi_modal_projector.linear_1"),
        "projector_linear_2": dense("multi_modal_projector.linear_2"),
        "image_newline": jnp.asarray(sd["image_newline"], jnp.float32),
        "language_model": lm["params"],
    }
    return {"params": params}


def load_hf_llava_next(model_dir: str, dtype=jnp.float32, scan_layers: bool = True):
    """Load a local HF LLaVA-Next checkpoint dir into (LlavaNextConfig, variables)."""
    from nexus_tpu.models.llava_next import LlavaNextConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    config = LlavaNextConfig.from_hf(cfg_dict)

    sd = load_hf_state_dict(model_dir)
    return config, torch_llava_next_to_flax(sd, config, dtype=dtype, scan_layers=scan_layers)
