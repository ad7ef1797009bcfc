"""Llama/Qwen-class causal decoder in Flax — the backbone for decoder-only
(LLM) embedders and the VLM language tower (reference role: the causal LMs
loaded by Nexus/training/embedder/text_retrieval/decoder_only/load_model.py).

Architecture: RMSNorm (pre-norm), rotary position embeddings, grouped-query
attention, SwiGLU MLP. TPU-first: bf16 compute with f32 norms, scan over
layers (one compile), optional Pallas causal flash attention, optional LoRA
on the attention projections.
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
class LlamaConfig(AbsArguments):
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # GQA; None -> MHA
    head_dim: Optional[int] = None  # Qwen3 decouples it from hidden/heads
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # Qwen2 uses True for qkv
    qk_norm: bool = False  # Qwen3: per-head RMSNorm on q/k after projection
    pad_token_id: int = 0
    # 'xla' | 'pallas' (blocked flash attention) | 'fused' (the
    # ops/fused_decoder.py megakernel: RMSNorm+QKV+RoPE+attention+O+residual
    # in one Pallas program per row; padding-side agnostic — the model layer
    # uses the segment flavor with tables from the real positions; LoRA
    # adapters merge into the effective kernels outside the megakernel —
    # and falls back to flash when the shape/VMEM gate rejects)
    attention_impl: str = "xla"
    # int8 W8A8 serving (models/quantize.py:quantize_llama_params): halves
    # weight bytes; inference-only, LoRA must be merged first. Composes
    # with attention_impl='fused': the megakernel consumes dequantized
    # attention projections (int8 in HBM) while the MLP keeps int8 GEMMs
    quantized: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @classmethod
    def from_hf(cls, hf_config) -> "LlamaConfig":
        import dataclasses as _dc

        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        names = {f.name for f in _dc.fields(cls)}
        # None must not override defaults (HF serializes e.g. pad_token_id
        # as null, which would crash mask derivation)
        kw = {k: v for k, v in d.items() if k in names and v is not None}
        model_type = str(d.get("model_type", ""))
        if model_type == "qwen2":
            # Qwen2's config.json carries no attention_bias key but the
            # architecture uses QKV biases
            kw.setdefault("attention_bias", True)
        if model_type.startswith("qwen3"):
            kw.setdefault("qk_norm", True)  # per-head q/k RMSNorm, no bias
        return cls(**kw)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * w).astype(x.dtype)


def rotary_embedding(x: Array, positions: Array, theta: float) -> Array:
    """Apply RoPE to [B, L, H, D]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None, :]  # [B, L, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class _DenseParams(nn.Module):
    """Materializes the SAME param tree as an nn.Dense (key 'kernel' +
    optional 'bias', identical initializers/param dtype) without computing —
    the fused megakernel path reads raw weights while keeping checkpoints
    and hf_convert layouts byte-compatible with the unfused path."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int, dtype):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        if not self.use_bias:
            return k.astype(dtype), None
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k.astype(dtype), b


class _RMSParams(nn.Module):
    """RMSNorm's param tree ('weight') without computing."""

    @nn.compact
    def __call__(self, features: int):
        return self.param("weight", nn.initializers.ones, (features,),
                          jnp.float32)


class _LoRADenseParams(nn.Module):
    """Materializes LoRADense's param tree (base/kernel[,bias] + lora_A/B)
    and returns the EFFECTIVE kernel `base + (alpha/r)·A@B` — the fused
    megakernel consumes one merged weight while the adapters stay separate
    trainable leaves (gradients flow through the merge by plain autodiff;
    the kernel's custom-vjp only sees the merged operand)."""

    features: int
    use_bias: bool
    lora_rank: int
    lora_alpha: float

    @nn.compact
    def __call__(self, in_features: int, dtype):
        base = _DenseParams(self.features, self.use_bias, name="base")
        k, b = base(in_features, dtype)
        a = self.param("lora_A", nn.initializers.normal(stddev=0.02),
                       (in_features, self.lora_rank), jnp.float32)
        bb = self.param("lora_B", nn.initializers.zeros,
                        (self.lora_rank, self.features), jnp.float32)
        scale = self.lora_alpha / self.lora_rank
        k_eff = k.astype(jnp.float32) + a @ bb * scale
        return k_eff.astype(dtype), b


class _DequantDenseParams(nn.Module):
    """Materializes QuantDense's param tree (int8 'kernel' + f32 'scale'
    [+ 'bias']) and returns the DEQUANTIZED effective kernel — the fused
    decoder megakernel's int8-serving composition. Weights stay int8 in HBM
    (the halved-weight-bytes win quantized LLM serving is for); the [K, N]
    dequant multiply runs once per layer step and is amortized over the
    GEMM's row dimension. Net: attention projections run bf16 INSIDE the
    fused program (slightly more accurate than the unfused path's
    activation-quantized int8 GEMMs) while the XLA MLP — 2/3 of decoder
    FLOPs — keeps the int8 QuantDense path."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int, dtype):
        k = self.param("kernel", nn.initializers.zeros,
                       (in_features, self.features), jnp.int8)
        s = self.param("scale", nn.initializers.ones,
                       (self.features,), jnp.float32)
        w = (k.astype(jnp.float32) * s[None, :]).astype(dtype)
        if not self.use_bias:
            return w, None
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return w, b


def _fused_dense_factory(config):
    """Param-materializer factory for the fused megakernel paths: plain
    Dense trees, LoRADense trees with the adapters merged into the
    effective kernel when config.lora_rank > 0, or dequantized QuantDense
    trees when config.quantized (int8 serving)."""
    if getattr(config, "quantized", False):
        return lambda f, bias, name: _DequantDenseParams(f, bias, name=name)
    if getattr(config, "lora_rank", 0) > 0:
        return lambda f, bias, name: _LoRADenseParams(
            f, bias, config.lora_rank, config.lora_alpha, name=name)
    return _DenseParams


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    ring_mesh: Optional[object] = None  # Mesh for attention_impl='ring'

    def _dense(self, features, name, use_bias):
        from nexus_tpu.models.lora import lora_dense

        return lora_dense(self.config, features, name, use_bias, self.dtype)

    @nn.compact
    def __call__(self, x: Array, attention_mask: Array, positions: Array,
                 return_weights: bool = False, segment_ids: Optional[Array] = None):
        """``segment_ids`` [B, L] (0 = pad, 1.. = packed sequence id):
        causal attention restricted to same-segment tokens — the packed-rows
        layout from ops/packing.py. ``positions`` must then restart per
        segment (pack_tokenized's position_ids)."""
        c = self.config
        if return_weights:
            # fused megakernel path: materialize the identical param tree
            # and hand the raw packed [H, (nq+2nkv)d] projection + o_proj
            # to the kernel (GQA K/V never repeated in HBM). With LoRA the
            # EFFECTIVE merged kernels feed the megakernel while adapters
            # stay separate trainable leaves.
            h = c.hidden_size
            n_q = c.num_attention_heads
            n_kv = c.num_key_value_heads or n_q
            head_dim = c.head_dim or h // n_q
            dense = _fused_dense_factory(c)
            wq, bq = dense(n_q * head_dim, c.attention_bias,
                           name="q_proj")(h, self.dtype)
            wk, bk = dense(n_kv * head_dim, c.attention_bias,
                           name="k_proj")(h, self.dtype)
            wv, bv = dense(n_kv * head_dim, c.attention_bias,
                           name="v_proj")(h, self.dtype)
            wo, _ = dense(h, False, name="o_proj")(n_q * head_dim,
                                                   self.dtype)
            wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
            bqkv = (jnp.concatenate([bq, bk, bv]) if c.attention_bias
                    else None)
            qn = kn = None
            if c.qk_norm:
                qn = _RMSParams(name="q_norm")(head_dim)
                kn = _RMSParams(name="k_norm")(head_dim)
            return wqkv, bqkv, wo, qn, kn
        h = c.hidden_size
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        head_dim = c.head_dim or h // n_q  # Qwen3 decouples it
        b, l, _ = x.shape
        q = self._dense(n_q * head_dim, "q_proj", c.attention_bias)(x).reshape(b, l, n_q, head_dim)
        k = self._dense(n_kv * head_dim, "k_proj", c.attention_bias)(x).reshape(b, l, n_kv, head_dim)
        v = self._dense(n_kv * head_dim, "v_proj", c.attention_bias)(x).reshape(b, l, n_kv, head_dim)
        if c.qk_norm:  # Qwen3: per-head RMSNorm before RoPE
            q = RMSNorm(c.rms_norm_eps, name="q_norm")(q)
            k = RMSNorm(c.rms_norm_eps, name="k_norm")(k)
        q = rotary_embedding(q, positions, c.rope_theta)
        k = rotary_embedding(k, positions, c.rope_theta)
        if n_kv != n_q:  # GQA: repeat kv heads
            rep = n_q // n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        if c.attention_impl == "ring" and self.ring_mesh is not None:
            # sequence parallelism: attention over an L sharded across the
            # `sp` mesh axis (ops/ring_attention.py) — fine-tune contexts
            # beyond one chip's activation memory through the same stack
            from nexus_tpu.ops.ring_attention import ring_attention

            seg = attention_mask if segment_ids is None else segment_ids
            ctx = ring_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), seg.astype(jnp.int32),
                mesh=self.ring_mesh, causal=True,
            ).transpose(0, 2, 1, 3)
        elif c.attention_impl in ("pallas", "fused"):
            # 'fused' lands here only when the megakernel gate rejected
            # (shape/VMEM/LoRA/packed rows) — flash is the graceful fallback.
            # The 0/1 attention mask doubles as segment ids for the unpacked
            # case; packed rows pass their real segment ids.
            from nexus_tpu.ops.flash_attention import flash_attention

            seg = attention_mask if segment_ids is None else segment_ids
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                seg.astype(jnp.int32), 128, 128, True,
            ).transpose(0, 2, 1, 3)
        else:
            scale = 1.0 / jnp.sqrt(head_dim)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
            causal = jnp.tril(jnp.ones((l, l), bool))
            if segment_ids is None:
                keep = causal[None, None] & attention_mask[:, None, None, :].astype(bool)
            else:
                same = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
                    segment_ids[:, None, :] != 0
                )
                keep = causal[None, None] & same[:, None]
            s = jnp.where(keep, s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        out = ctx.reshape(b, l, n_q * head_dim)
        return self._dense(h, "o_proj", False)(out)


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.config
        from nexus_tpu.models.lora import lora_dense

        gate = lora_dense(c, c.intermediate_size, "gate_proj", False, self.dtype,
                          plain=True)(x)
        up = lora_dense(c, c.intermediate_size, "up_proj", False, self.dtype,
                        plain=True)(x)
        return lora_dense(c, c.hidden_size, "down_proj", False, self.dtype,
                          plain=True)(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    ring_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x, attention_mask, positions, segment_ids=None,
                 rope_tables=None):
        """``rope_tables``: optional (cos, sin) [B, L, head_dim] precomputed
        once by LlamaModel for the fused path — avoids rebuilding the trig
        tables and the position gather in every layer of the scan."""
        c = self.config
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        head_dim = c.head_dim or c.hidden_size // n_q
        if c.attention_impl == "fused":
            # composes with quantized serving: the attention projections
            # dequantize to bf16 for the kernel (_DequantDenseParams), the
            # MLP keeps its int8 QuantDense GEMMs
            from nexus_tpu.ops.fused_decoder import (
                fused_decoder_block, fused_decoder_supported,
                iota_rope_tables)

            fuse = fused_decoder_supported(c.hidden_size, n_q, n_kv,
                                           head_dim, x.shape[1])
        else:
            fuse = False
        if fuse:
            # one Pallas program per row: input RMSNorm + QKV (+bias) +
            # qk-norm + RoPE + causal GQA attention + O + residual
            # (padding/packing semantics centralized in fused_decoder_block)
            wqkv, bqkv, wo, qn, kn = LlamaAttention(
                c, dtype=self.dtype, name="self_attn")(
                x, attention_mask, positions, return_weights=True)
            rms_w = _RMSParams(name="input_layernorm")(c.hidden_size)
            if rope_tables is None:
                bc, bs = iota_rope_tables(x.shape[1], head_dim, c.rope_theta)
                rope_tables = (bc[0][positions], bs[0][positions])
            x = fused_decoder_block(
                x, attention_mask, rope_tables[0], rope_tables[1],
                wqkv=wqkv, wo=wo, rms_w=rms_w, bqkv=bqkv,
                q_norm_w=qn, k_norm_w=kn, num_q_heads=n_q,
                num_kv_heads=n_kv, head_dim=head_dim, eps=c.rms_norm_eps,
                segment_ids=segment_ids)
        else:
            attn = LlamaAttention(c, dtype=self.dtype, ring_mesh=self.ring_mesh,
                                  name="self_attn")(
                RMSNorm(c.rms_norm_eps, name="input_layernorm")(x),
                attention_mask, positions, segment_ids=segment_ids,
            )
            x = x + attn
        mlp = LlamaMLP(c, dtype=self.dtype, name="mlp")(
            RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        )
        return x + mlp


class _ScannedLlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    ring_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x, _, attention_mask, positions, segment_ids,
                 rope_tables):
        return LlamaLayer(self.config, dtype=self.dtype,
                          ring_mesh=self.ring_mesh, name="layer")(
            x, attention_mask, positions, segment_ids=segment_ids,
            rope_tables=rope_tables,
        ), None


class LlamaModel(nn.Module):
    """Causal decoder returning last_hidden_state (no LM head by default —
    embedder use; `with_lm_head=True` adds tied/untied logits)."""

    config: LlamaConfig
    dtype: jnp.dtype = jnp.bfloat16
    scan_layers: bool = True
    with_lm_head: bool = False
    remat: bool = False  # gradient checkpointing over the layer scan
    remat_policy: Optional[str] = None  # None=full | 'dots' = save matmul
    # outputs | 'offload_dots' = park them in host RAM (see models/bert.py)
    ring_mesh: Optional[object] = None  # Mesh with an 'sp' axis: with
    # config.attention_impl='ring', attention runs sequence-sharded over it

    @nn.compact
    def __call__(self, input_ids: Optional[Array] = None, attention_mask: Optional[Array] = None,
                 positions: Optional[Array] = None, train: bool = False,
                 inputs_embeds: Optional[Array] = None,
                 override_mask: Optional[Array] = None, override_embeds: Optional[Array] = None,
                 segment_ids: Optional[Array] = None):
        """``override_mask [B, L]`` + ``override_embeds [B, L, D]`` replace the
        token embeddings at masked positions AFTER the embed lookup — the VLM
        image-feature merge (placeholder tokens take vision features) without
        giving up the shared embed table.

        ``segment_ids`` [B, L]: packed-rows mode (ops/packing.py layout) —
        causal attention within each segment; pass the per-segment restarting
        ``positions`` alongside."""
        c = self.config
        if attention_mask is None:
            if input_ids is None:
                raise ValueError("attention_mask required with inputs_embeds")
            pad_src = segment_ids if segment_ids is not None else input_ids
            attention_mask = (pad_src != (0 if segment_ids is not None
                                          else c.pad_token_id)).astype(jnp.int32)
        if positions is None:
            if segment_ids is not None:
                # cumsum positions would NOT restart per packed segment —
                # silent wrong RoPE; packing layers always have position_ids
                raise ValueError("segment_ids (packed rows) requires explicit "
                                 "positions that restart per segment")
            # left-padding-safe positions: cumsum over valid tokens
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="embed_tokens")
        x = inputs_embeds.astype(self.dtype) if inputs_embeds is not None else embed(input_ids)
        if override_mask is not None:
            x = jnp.where(override_mask[..., None], override_embeds.astype(x.dtype), x)
        rope_tables = None
        if c.attention_impl == "fused":
            # hoist the fused path's rotary tables out of the layer scan:
            # one trig build + one position gather for the whole stack
            from nexus_tpu.ops.fused_decoder import (
                fused_decoder_supported, iota_rope_tables)

            n_kv = c.num_key_value_heads or c.num_attention_heads
            head_dim = c.head_dim or c.hidden_size // c.num_attention_heads
            if fused_decoder_supported(c.hidden_size, c.num_attention_heads,
                                       n_kv, head_dim, x.shape[1]):
                bc, bs = iota_rope_tables(x.shape[1], head_dim, c.rope_theta)
                rope_tables = (bc[0][positions], bs[0][positions])
        if self.scan_layers:
            if self.remat:
                remat_kw = {}
                if self.remat_policy == "dots":
                    remat_kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                elif self.remat_policy == "offload_dots":
                    remat_kw["policy"] = jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                        "device", "pinned_host")
                layer_cls = nn.remat(_ScannedLlamaLayer, **remat_kw)
            else:
                layer_cls = _ScannedLlamaLayer
            Scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_hidden_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, nn.broadcast),
            )
            x, _ = Scanned(c, dtype=self.dtype, ring_mesh=self.ring_mesh,
                           name="layers")(
                x, None, attention_mask, positions, segment_ids, rope_tables)
        else:
            for i in range(c.num_hidden_layers):
                x = LlamaLayer(c, dtype=self.dtype, ring_mesh=self.ring_mesh,
                               name=f"layer_{i}")(
                    x, attention_mask, positions, segment_ids=segment_ids,
                    rope_tables=rope_tables)
        x = RMSNorm(c.rms_norm_eps, name="norm")(x)
        out = {"last_hidden_state": x}
        if self.with_lm_head:
            if c.tie_word_embeddings:
                logits = embed.attend(x.astype(jnp.float32))
            else:
                logits = nn.Dense(c.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head")(x)
            out["logits"] = logits
        return out
