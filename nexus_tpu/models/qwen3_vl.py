"""Qwen3-VL backbone in Flax — the deepstack VLM family (reference role: the
qwen3-vl backbones loaded by Nexus/modules/multimodal.py:172-512 and the
MMEB-v2 wrappers Nexus/evaluation/mmeb_v2/qwen3_vl_embedding.py /
qwen3_vl_reranker.py via transformers).

Architecture (numerically matched against HF Qwen3VLModel in
tests/test_qwen3_vl.py):
- vision tower: Conv3D-as-Dense patch embed + LEARNED absolute position
  embeddings bilinearly interpolated from a square num_position_embeddings
  grid, 2D rotary, pre-LayerNorm blocks with fused QKV and a plain
  fc1/act/fc2 MLP (full attention in every layer — no windows);
- DEEPSTACK: features tapped after `deepstack_visual_indexes` vision layers
  run through dedicated post-shuffle-norm patch mergers and are ADDED to the
  text hidden states at the visual token positions after each of the first
  len(indexes) decoder layers (DeepStack, arXiv:2406.04334);
- text trunk: Qwen3 (no QKV biases, per-head-dim RMSNorm on q/k) with
  INTERLEAVED M-RoPE — frequency channels interleave (T,H,W) as
  [THWTHW...TT] instead of Qwen2-VL's chunked sections.

TPU-first deviations (behavior-preserving, same stance as qwen2_vl.py):
- STATIC shapes: one pinned (t, h, w) grid per compiled tower; the absolute
  position-embedding interpolation weights and rotary tables for that grid
  are baked at trace time as constants;
- scan-over-layers; the text trunk splits into TWO scans — the first
  len(deepstack) layers consume the per-layer injection tensor as scan xs,
  the remainder run plain — so no [depth, B, L, D] zeros tensor exists;
- deepstack injection is a masked add (jnp.where over the image-token mask),
  not an in-place scatter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.config import AbsArguments
from nexus_tpu.models.llama import LlamaConfig, RMSNorm
from nexus_tpu.models.qwen2_vl import _ACT, _rotate_half, vision_rotary_tables

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclass
class Qwen3VLVisionConfig(AbsArguments):
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: List[int] = field(default_factory=lambda: [8, 16, 24])
    hidden_act: str = "gelu_pytorch_tanh"
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf(cls, d) -> "Qwen3VLVisionConfig":
        import dataclasses as _dc

        d = d.to_dict() if hasattr(d, "to_dict") else dict(d)
        names = {f.name for f in _dc.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclass
class Qwen3VLConfig(AbsArguments):
    vision: Qwen3VLVisionConfig = None
    text: LlamaConfig = None
    mrope_section: List[int] = field(default_factory=lambda: [24, 20, 20])
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    variant: str = "qwen3-vl"

    @classmethod
    def from_hf(cls, hf_config) -> "Qwen3VLConfig":
        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        text = d.get("text_config", d)
        tc = LlamaConfig.from_hf(text)
        tc.attention_bias = False  # Qwen3: no QKV biases (q/k RMSNorm instead)
        rope_scaling = text.get("rope_scaling") or {}
        # HF model_type 'qwen3_5' (Qwen3.5) shares this backbone; the variant
        # tag keeps the family distinction for processor/chat-template paths
        variant = "qwen3.5" if "qwen3_5" in str(d.get("model_type", "")) else "qwen3-vl"
        return cls(
            variant=variant,
            vision=Qwen3VLVisionConfig.from_hf(d["vision_config"]),
            text=tc,
            mrope_section=list(rope_scaling.get("mrope_section", [24, 20, 20])),
            image_token_id=d.get("image_token_id", 151655),
            video_token_id=d.get("video_token_id", 151656),
            vision_start_token_id=d.get("vision_start_token_id", 151652),
            vision_end_token_id=d.get("vision_end_token_id", 151653),
        )

    @staticmethod
    def from_dict(d: dict) -> "Qwen3VLConfig":
        d = dict(d)
        if isinstance(d.get("vision"), dict):
            d["vision"] = Qwen3VLVisionConfig.from_dict(d["vision"])
        if isinstance(d.get("text"), dict):
            d["text"] = LlamaConfig.from_dict(d["text"])
        names = set(Qwen3VLConfig.__dataclass_fields__)
        return Qwen3VLConfig(**{k: v for k, v in d.items() if k in names})


# ---------------------------------------------------------------------------
# static position-embedding interpolation (HF fast_pos_embed_interpolate)
# ---------------------------------------------------------------------------

def pos_embed_interp_tables(
    grid_thw: Tuple[int, int, int], num_grid_per_side: int, merge: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear-interpolation (indices [4, t*h*w], weights [4, t*h*w]) into a
    [side², D] learned table for one static grid, already permuted to the
    processor's merge-group patch order and tiled over t frames."""
    t, h, w = grid_thw
    side = num_grid_per_side
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    h_flr, w_flr = h_idx.astype(np.int64), w_idx.astype(np.int64)
    h_cl = np.clip(h_flr + 1, None, side - 1)
    w_cl = np.clip(w_flr + 1, None, side - 1)
    dh, dw = h_idx - h_flr, w_idx - w_flr
    idx = np.stack([
        (h_flr[:, None] * side + w_flr[None, :]).reshape(-1),
        (h_flr[:, None] * side + w_cl[None, :]).reshape(-1),
        (h_cl[:, None] * side + w_flr[None, :]).reshape(-1),
        (h_cl[:, None] * side + w_cl[None, :]).reshape(-1),
    ])  # [4, h*w] row-major
    wts = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
        ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
        (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
        (dh[:, None] * dw[None, :]).reshape(-1),
    ]).astype(np.float32)
    # row-major (h, w) -> merge-group order, then tile over t
    perm = (
        np.arange(h * w)
        .reshape(h // merge, merge, w // merge, merge)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    idx = np.tile(idx[:, perm], (1, t))
    wts = np.tile(wts[:, perm], (1, t))
    return idx, wts


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

class Qwen3VLVisionBlock(nn.Module):
    config: Qwen3VLVisionConfig
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1  # attention stays within each temporal frame's h*w
    # patches (HF cu_seqlens = repeat_interleave(h*w, t) semantics)

    @nn.compact
    def __call__(self, x: Array, cos: Array, sin: Array):
        c = self.config
        n, p, d = x.shape
        hd = c.head_dim
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="qkv")(h)
        q, k, v = (t.reshape(n, p, c.num_heads, hd) for t in jnp.split(qkv, 3, axis=-1))
        cb, sb = cos[None, :, None, :], sin[None, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cb + _rotate_half(qf) * sb).astype(self.dtype)
        k = (kf * cb + _rotate_half(kf) * sb).astype(self.dtype)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        if self.grid_t > 1:  # static per-frame block-diagonal mask
            seg = np.arange(p) // (p // self.grid_t)
            keep = jnp.asarray(seg[:, None] == seg[None, :])
            s = jnp.where(keep[None, None], s, -1e30)
        probs = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, p, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_proj")(ctx)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="linear_fc1")(h)
        h = _ACT[c.hidden_act](h)
        h = nn.Dense(d, dtype=self.dtype, name="linear_fc2")(h)
        return x + h


class _ScannedVision3Block(nn.Module):
    config: Qwen3VLVisionConfig
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1

    @nn.compact
    def __call__(self, x, _, cos, sin):
        out = Qwen3VLVisionBlock(self.config, dtype=self.dtype, grid_t=self.grid_t,
                                 name="block")(x, cos, sin)
        # carry AND emit: ys collects every layer's hidden states so the
        # deepstack taps can be gathered after the scan
        return out, out


class _PatchMerger(nn.Module):
    """norm -> concat merge² group -> fc1 -> GELU -> fc2. With
    ``postshuffle_norm`` the LayerNorm runs over the concatenated group
    (deepstack mergers); otherwise over single tokens (main merger)."""

    config: Qwen3VLVisionConfig
    postshuffle_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.config
        n, p, d = x.shape
        m2 = c.spatial_merge_size**2
        if self.postshuffle_norm:
            x = x.reshape(n, p // m2, m2 * d)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
            x = x.reshape(n, p // m2, m2 * d)
        x = nn.Dense(m2 * d, dtype=self.dtype, name="linear_fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(c.out_hidden_size, dtype=self.dtype, name="linear_fc2")(x)


class Qwen3VLVisionTower(nn.Module):
    """[N, P, patch_dim] flattened patches (one static grid) ->
    (merged tokens [N, K, out_hidden], deepstack features list of the same
    shape, one per deepstack_visual_indexes entry)."""

    config: Qwen3VLVisionConfig
    grid_thw: Tuple[int, int, int] = (1, 16, 16)
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True

    @nn.compact
    def __call__(self, patches: Array, train: bool = False):
        c = self.config
        n, p, _ = patches.shape
        x = nn.Dense(c.hidden_size, use_bias=True, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        side = int(round(c.num_position_embeddings ** 0.5))
        idx_np, wts_np = pos_embed_interp_tables(self.grid_thw, side, c.spatial_merge_size)
        table = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (c.num_position_embeddings, c.hidden_size),
            jnp.float32,
        )
        pos = jnp.sum(
            table[jnp.asarray(idx_np)] * jnp.asarray(wts_np)[:, :, None], axis=0
        )  # [P, D]
        x = x + pos[None].astype(self.dtype)

        cos_np, sin_np = vision_rotary_tables(
            self.grid_thw, c.head_dim, c.spatial_merge_size, c.rope_theta
        )
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        if self.scan_layers:
            Scanned = nn.scan(
                _ScannedVision3Block,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.depth,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            x, ys = Scanned(c, dtype=self.dtype, grid_t=self.grid_thw[0],
                            name="blocks")(x, None, cos, sin)
            taps = [ys[i] for i in c.deepstack_visual_indexes]
        else:
            taps = []
            for i in range(c.depth):
                x = Qwen3VLVisionBlock(c, dtype=self.dtype, grid_t=self.grid_thw[0],
                                       name=f"block_{i}")(x, cos, sin)
                if i in c.deepstack_visual_indexes:
                    taps.append(x)
        merged = _PatchMerger(c, postshuffle_norm=False, dtype=self.dtype, name="merger")(x)
        deepstack = [
            _PatchMerger(c, postshuffle_norm=True, dtype=self.dtype,
                         name=f"deepstack_merger_{j}")(taps[j])
            for j in range(len(c.deepstack_visual_indexes))
        ]
        return merged, deepstack


# ---------------------------------------------------------------------------
# interleaved M-RoPE (HF Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope)
# ---------------------------------------------------------------------------

def mrope_interleaved_cos_sin(
    positions3: Array, head_dim: int, theta: float, sections: List[int],
) -> Tuple[Array, Array]:
    """cos/sin [B, L, head_dim] from 3-component positions [3, B, L].
    Channel c of the head_dim/2 frequency channels takes its angle from
    component H if c ≡ 1 (mod 3) and c < 3·sections[1], W if c ≡ 2 (mod 3)
    and c < 3·sections[2], else T — the interleaved [THWTHW…TT] layout."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    angles = positions3[..., None].astype(jnp.float32) * jnp.asarray(inv_freq, jnp.float32)
    comp = np.zeros(half, np.int64)
    comp[1 : sections[1] * 3 : 3] = 1
    comp[2 : sections[2] * 3 : 3] = 2
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[:, comp])  # [3, half]
    freqs = jnp.sum(angles * onehot[:, None, None, :], axis=0)  # [B, L, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


# ---------------------------------------------------------------------------
# text trunk (Qwen3: q/k head RMSNorm, no biases)
# ---------------------------------------------------------------------------

class Qwen3VLTextAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, cos, sin, return_weights=False):
        from nexus_tpu.models.lora import lora_dense

        c = self.config
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        hd = getattr(c, "head_dim", None) or c.hidden_size // n_q
        if return_weights:
            # fused megakernel path (ops/fused_decoder.py): identical param
            # tree, raw packed projections handed to the kernel (LoRA
            # adapters merge into the effective kernels)
            from nexus_tpu.models.llama import _RMSParams, _fused_dense_factory

            dense = _fused_dense_factory(c)
            wq, _ = dense(n_q * hd, False, name="q_proj")(
                c.hidden_size, self.dtype)
            wk, _ = dense(n_kv * hd, False, name="k_proj")(
                c.hidden_size, self.dtype)
            wv, _ = dense(n_kv * hd, False, name="v_proj")(
                c.hidden_size, self.dtype)
            wo, _ = dense(c.hidden_size, False, name="o_proj")(
                n_q * hd, self.dtype)
            qn = _RMSParams(name="q_norm")(hd)
            kn = _RMSParams(name="k_norm")(hd)
            return jnp.concatenate([wq, wk, wv], axis=-1), wo, qn, kn
        b, l, _ = x.shape
        q = lora_dense(c, n_q * hd, "q_proj", False, self.dtype)(x).reshape(b, l, n_q, hd)
        k = lora_dense(c, n_kv * hd, "k_proj", False, self.dtype)(x).reshape(b, l, n_kv, hd)
        v = lora_dense(c, n_kv * hd, "v_proj", False, self.dtype)(x).reshape(b, l, n_kv, hd)
        q = RMSNorm(c.rms_norm_eps, name="q_norm")(q)
        k = RMSNorm(c.rms_norm_eps, name="k_norm")(k)
        cb, sb = cos[:, :, None, :], sin[:, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cb + _rotate_half(qf) * sb).astype(self.dtype)
        k = (kf * cb + _rotate_half(kf) * sb).astype(self.dtype)
        if n_kv != n_q:
            rep = n_q // n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        causal = jnp.tril(jnp.ones((l, l), bool))
        keep = causal[None, None] & attention_mask[:, None, None, :].astype(bool)
        s = jnp.where(keep, s, -1e30)
        probs = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, n_q * hd)
        return lora_dense(c, c.hidden_size, "o_proj", False, self.dtype)(ctx)


class Qwen3VLTextLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, cos, sin):
        from nexus_tpu.models.llama import LlamaMLP, _RMSParams

        c = self.config
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        hd = getattr(c, "head_dim", None) or c.hidden_size // n_q
        if c.attention_impl == "fused":
            from nexus_tpu.ops.fused_decoder import (
                fused_decoder_block, fused_decoder_supported)

            fuse = fused_decoder_supported(c.hidden_size, n_q, n_kv, hd,
                                           x.shape[1])
        else:
            fuse = False
        if fuse:
            # megakernel with qk-norm in-kernel and the M-RoPE tables
            # passed straight through
            wqkv, wo, qn, kn = Qwen3VLTextAttention(
                c, dtype=self.dtype, name="self_attn")(
                x, attention_mask, cos, sin, return_weights=True)
            rms_w = _RMSParams(name="input_layernorm")(c.hidden_size)
            x = fused_decoder_block(
                x, attention_mask, cos, sin, wqkv=wqkv, wo=wo, rms_w=rms_w,
                q_norm_w=qn, k_norm_w=kn, num_q_heads=n_q, num_kv_heads=n_kv,
                head_dim=hd, eps=c.rms_norm_eps)
        else:
            x = x + Qwen3VLTextAttention(c, dtype=self.dtype, name="self_attn")(
                RMSNorm(c.rms_norm_eps, name="input_layernorm")(x), attention_mask, cos, sin
            )
        return x + LlamaMLP(c, dtype=self.dtype, name="mlp")(
            RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        )


class _ScannedText3Layer(nn.Module):
    """Plain decoder layer for scanning (no per-layer xs)."""

    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _, attention_mask, cos, sin):
        return Qwen3VLTextLayer(self.config, dtype=self.dtype, name="layer")(
            x, attention_mask, cos, sin
        ), None


class _ScannedDeepstackLayer(nn.Module):
    """Decoder layer whose scan xs is the per-layer deepstack injection
    [B, L, D] (already masked to visual positions), added AFTER the layer."""

    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inject, attention_mask, cos, sin):
        out = Qwen3VLTextLayer(self.config, dtype=self.dtype, name="layer")(
            x, attention_mask, cos, sin
        )
        return out + inject.astype(out.dtype), None


# ---------------------------------------------------------------------------
# full backbone
# ---------------------------------------------------------------------------

class Qwen3VLBackbone(nn.Module):
    """input_ids + flattened image patches -> last_hidden_state, with merged
    vision tokens scattered over image-token positions AND deepstack features
    added to the first len(deepstack_visual_indexes) decoder layers' outputs
    at those positions (HF Qwen3VLModel parity)."""

    config: Qwen3VLConfig
    grid_thw: Tuple[int, int, int] = (1, 16, 16)
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: Array,  # [B, L]
        attention_mask: Optional[Array] = None,  # [B, L]
        pixel_patches: Optional[Array] = None,  # [N_img, P, patch_dim]
        positions3: Optional[Array] = None,  # [3, B, L]
        train: bool = False,
    ):
        c = self.config
        tc = c.text
        n_deep = len(c.vision.deepstack_visual_indexes)
        if attention_mask is None:
            pad = tc.pad_token_id if tc.pad_token_id is not None else -1
            attention_mask = (input_ids != pad).astype(jnp.int32)
        if positions3 is None:
            pos = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            positions3 = jnp.broadcast_to(pos[None], (3, *pos.shape))
        embed = nn.Embed(tc.vocab_size, tc.hidden_size, dtype=self.dtype, name="embed_tokens")
        x = embed(input_ids)

        injections = None
        if pixel_patches is not None:
            tower = Qwen3VLVisionTower(
                c.vision, grid_thw=self.grid_thw, dtype=self.dtype,
                scan_layers=self.scan_layers, name="visual",
            )
            vis, deepstack = tower(pixel_patches, train)
            is_img = (input_ids == c.image_token_id) | (input_ids == c.video_token_id)
            order = jnp.cumsum(is_img.reshape(-1)) - 1

            def scatter(feats):  # [N, K, D] -> [B, L, D] at image positions
                flat = feats.reshape(-1, feats.shape[-1])
                g = flat[jnp.clip(order, 0, flat.shape[0] - 1)].reshape(*input_ids.shape, -1)
                return jnp.where(is_img[..., None], g, 0.0)

            x = jnp.where(is_img[..., None], scatter(vis).astype(x.dtype), x)
            injections = jnp.stack([scatter(f) for f in deepstack])  # [n_deep, B, L, D]
        if injections is None:
            injections = jnp.zeros((n_deep, *x.shape), self.dtype)

        hd = getattr(tc, "head_dim", None) or tc.hidden_size // tc.num_attention_heads
        cos, sin = mrope_interleaved_cos_sin(positions3, hd, tc.rope_theta, c.mrope_section)
        if self.scan_layers:
            deep_cls = (
                nn.remat(_ScannedDeepstackLayer) if self.remat else _ScannedDeepstackLayer
            )
            rest_cls = nn.remat(_ScannedText3Layer) if self.remat else _ScannedText3Layer
            scan_kw = dict(variable_axes={"params": 0}, split_rngs={"params": True})
            if n_deep:
                ScanDeep = nn.scan(
                    deep_cls, length=n_deep,
                    in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast), **scan_kw,
                )
                x, _ = ScanDeep(tc, dtype=self.dtype, name="layers_deep")(
                    x, injections, attention_mask, cos, sin
                )
            ScanRest = nn.scan(
                rest_cls, length=tc.num_hidden_layers - n_deep,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast), **scan_kw,
            )
            x, _ = ScanRest(tc, dtype=self.dtype, name="layers")(
                x, None, attention_mask, cos, sin
            )
        else:
            for i in range(tc.num_hidden_layers):
                x = Qwen3VLTextLayer(tc, dtype=self.dtype, name=f"layer_{i}")(
                    x, attention_mask, cos, sin
                )
                if i < n_deep:
                    x = x + injections[i].astype(x.dtype)
        x = RMSNorm(tc.rms_norm_eps, name="norm")(x)
        return {"last_hidden_state": x}
