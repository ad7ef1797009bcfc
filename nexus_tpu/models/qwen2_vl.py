"""Qwen2-VL backbone in Flax — the real-VLM family for multimodal embedders
(reference role: the qwen2-vl/qwen2.5-vl backbones loaded by
Nexus/modules/multimodal.py:172-512 via transformers).

Architecture (numerically matched against HF Qwen2VLModel in
tests/test_qwen2_vl.py):
- vision tower: linear patch embed over [C*T*P*P] flattened patches, 2D
  rotary position embedding in merge-group patch order, pre-norm blocks with
  a fused QKV(+bias) projection, PatchMerger (LayerNorm -> concat 2x2
  spatial groups -> MLP to text hidden size);
- text trunk: Qwen2 (Llama + QKV bias) with M-RoPE — rotary frequencies
  split into (temporal, height, width) sections driven by 3-component
  position ids.

TPU-first deviations from the HF implementation (behavior-preserving):
- STATIC shapes: a batch of images is [N, P, patch_dim] with one static
  (t, h, w) grid (the processor pins resolution per bucket); vision
  attention is dense per image row — no cu_seqlens varlen machinery;
- rotary tables for the static grid are baked at trace time;
- scan-over-layers for both towers (one compile per depth).
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

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclass
class Qwen2VLVisionConfig(AbsArguments):
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    hidden_size: int = 3584  # output dim (= text hidden size)
    hidden_act: str = "quick_gelu"
    rope_theta: float = 10000.0
    # 'xla' = dense einsum attention; 'pallas' = flash kernel
    # (ops/flash_attention.py flash_vision_attention; handles the 80-wide
    # heads). MEASURED (BENCH_NOTES r5): at 256 AND 1024 patches the dense
    # XLA path is faster on v5e (flash pays the 80->128 lane pad on every
    # block matmul while the score matrix still fits the bandwidth budget),
    # so 'fused' — the recommended serving impl for the TEXT trunk — keeps
    # the vision tower on the XLA path; 'pallas' opts into flash (video /
    # multi-frame grids with L >= 4k are where it should pay).
    attention_impl: str = "xla"
    # int8 W8A8 for the block projection GEMMs (qkv/attn_proj/fc1/fc2);
    # patch_embed + PatchMerger stay fp. Scoped conversion:
    # models/quantize.py quantize_vlm_params(include_vision=True).
    quantized: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf(cls, d) -> "Qwen2VLVisionConfig":
        import dataclasses as _dc

        d = d.to_dict() if hasattr(d, "to_dict") else dict(d)
        d.setdefault("in_channels", d.pop("in_chans", 3))
        names = {f.name for f in _dc.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclass
class Qwen25VLVisionConfig(AbsArguments):
    """Qwen2.5-VL vision tower: RMSNorm blocks, gated-SiLU MLP, window
    attention with a few full-attention layers."""

    depth: int = 32
    hidden_size: int = 1280  # embed dim (HF 2.5 naming)
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112  # pixels; 112/2/14 = 4x4 merged units per window
    fullatt_block_indexes: List[int] = field(default_factory=lambda: [7, 15, 23, 31])
    out_hidden_size: int = 3584
    hidden_act: str = "silu"
    rope_theta: float = 10000.0
    tokens_per_second: int = 4  # video temporal M-RoPE spacing (HF 2.5)
    # 'xla' | 'pallas': flash kernel for the FULL-attention layers (window
    # layers' 64-patch spans stay dense). 'fused' keeps XLA attention here
    # too — measured slower via flash at 224-448 px grids (BENCH_NOTES r5).
    attention_impl: str = "xla"
    # int8 W8A8 block projections (qkv/attn_proj/gate/up/down_proj) — the
    # name-collision with the text trunk's gate/up/down_proj is resolved by
    # PATH-scoped conversion (quantize.py), not name exclusion
    quantized: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf(cls, d) -> "Qwen25VLVisionConfig":
        import dataclasses as _dc

        d = d.to_dict() if hasattr(d, "to_dict") else dict(d)
        names = {f.name for f in _dc.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclass
class Qwen2VLConfig(AbsArguments):
    vision: object = None  # Qwen2VLVisionConfig | Qwen25VLVisionConfig
    text: LlamaConfig = None
    mrope_section: List[int] = field(default_factory=lambda: [16, 24, 24])
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    variant: str = "qwen2-vl"  # qwen2-vl | qwen2.5-vl

    @classmethod
    def from_hf(cls, hf_config) -> "Qwen2VLConfig":
        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        is_25 = "qwen2_5" in str(d.get("model_type", "")) or "qwen2_5" in str(
            d.get("vision_config", {}).get("model_type", "")
        )
        text = d.get("text_config", d)
        tc = LlamaConfig.from_hf(text)
        tc.attention_bias = True  # Qwen2 QKV biases
        rope_scaling = text.get("rope_scaling") or {}
        vcfg = (Qwen25VLVisionConfig if is_25 else Qwen2VLVisionConfig).from_hf(
            d["vision_config"]
        )
        return cls(
            vision=vcfg,
            text=tc,
            mrope_section=list(rope_scaling.get("mrope_section", [16, 24, 24])),
            image_token_id=d.get("image_token_id", 151655),
            video_token_id=d.get("video_token_id", 151656),
            vision_start_token_id=d.get("vision_start_token_id", 151652),
            vision_end_token_id=d.get("vision_end_token_id", 151653),
            variant="qwen2.5-vl" if is_25 else "qwen2-vl",
        )

    @staticmethod
    def from_dict(d: dict) -> "Qwen2VLConfig":
        d = dict(d)
        if isinstance(d.get("vision"), dict):
            vcls = (Qwen25VLVisionConfig if d.get("variant") == "qwen2.5-vl"
                    else Qwen2VLVisionConfig)
            d["vision"] = vcls.from_dict(d["vision"])
        if isinstance(d.get("text"), dict):
            d["text"] = LlamaConfig.from_dict(d["text"])
        names = set(Qwen2VLConfig.__dataclass_fields__)
        return Qwen2VLConfig(**{k: v for k, v in d.items() if k in names})


# ---------------------------------------------------------------------------
# rotary helpers
# ---------------------------------------------------------------------------

def _rotate_half(x: Array) -> Array:
    x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
    return jnp.concatenate([-x2, x1], axis=-1)


def vision_rotary_tables(grid_thw: Tuple[int, int, int], head_dim: int,
                         merge: int, theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [P, head_dim] for one static (t, h, w) patch grid, in the
    processor's merge-group patch order (HF rot_pos_emb parity)."""
    t, h, w = grid_thw
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def to_merge_order(p):
        return p.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)

    pos = np.stack([to_merge_order(hpos), to_merge_order(wpos)], axis=-1)  # [h*w, 2]
    pos = np.tile(pos, (t, 1))  # [P, 2]
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = pos[:, :, None] * inv_freq[None, None, :]  # [P, 2, dim/2]
    freqs = freqs.reshape(pos.shape[0], -1)  # [P, head_dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def mrope_cos_sin(positions3: Array, head_dim: int, theta: float,
                  sections: List[int]) -> Tuple[Array, Array]:
    """M-RoPE cos/sin [B, L, head_dim] from 3-component positions [3, B, L].

    Frequency channels are split into 2*len(sections) chunks of sizes
    sections*2; chunk i takes its angle from position component i % 3
    (HF apply_multimodal_rotary_pos_emb parity — note a frequency's two
    duplicated halves may use DIFFERENT components; that asymmetry is part
    of the trained models)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    angles = positions3[..., None].astype(jnp.float32) * jnp.asarray(inv_freq, jnp.float32)
    emb = jnp.concatenate([angles, angles], axis=-1)  # [3, B, L, head_dim]
    comp = np.repeat([i % 3 for i in range(len(sections) * 2)],
                     np.tile(np.asarray(sections), 2))
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[:, comp])  # [3, head_dim]
    cos = jnp.sum(jnp.cos(emb) * onehot[:, None, None, :], axis=0)
    sin = jnp.sum(jnp.sin(emb) * onehot[:, None, None, :], axis=0)
    return cos, sin


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

_ACT = {
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu": nn.gelu,
    "silu": nn.silu,
    "gelu_pytorch_tanh": nn.gelu,
}


def _vision_dense(config, features: int, dtype, name: str, use_bias: bool = True):
    """nn.Dense, or the int8 QuantDense when config.quantized — the same
    serve-time dispatch the text trunks use (models/bert.py), scoped to the
    vision block projections (patch_embed/merger stay fp)."""
    if getattr(config, "quantized", False):
        from nexus_tpu.models.quantize import QuantDense

        return QuantDense(features, out_dtype=dtype, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class Qwen2VLVisionBlock(nn.Module):
    config: Qwen2VLVisionConfig
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1  # temporal frames per block: attention stays WITHIN each
    # frame's h*w patches (HF cu_seqlens = repeat(h*w, t) semantics)

    @nn.compact
    def __call__(self, x: Array, cos: Array, sin: Array):
        c = self.config
        n, p, d = x.shape
        hd = c.head_dim
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = _vision_dense(c, 3 * d, self.dtype, "qkv")(h)
        q, k, v = (t.reshape(n, p, c.num_heads, hd) for t in jnp.split(qkv, 3, axis=-1))
        # 2D rotary in f32 (HF applies rotary in float)
        cb, sb = cos[None, :, None, :], sin[None, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cb + _rotate_half(qf) * sb).astype(self.dtype)
        k = (kf * cb + _rotate_half(kf) * sb).astype(self.dtype)
        if c.attention_impl == "pallas":
            from nexus_tpu.ops.flash_attention import flash_vision_attention

            # per-frame attention becomes segment ids (ids start at 1 — 0
            # means padding to the kernel)
            seg_ids = (np.arange(p) // (p // self.grid_t) + 1
                       if self.grid_t > 1 else np.ones((p,), np.int32))
            ctx = flash_vision_attention(
                q, k, v, jnp.asarray(seg_ids, jnp.int32)).reshape(n, p, d)
        else:
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
            if self.grid_t > 1:  # static per-frame block-diagonal mask
                seg = np.arange(p) // (p // self.grid_t)
                keep = jnp.asarray(seg[:, None] == seg[None, :])
                s = jnp.where(keep[None, None], s, -1e30)
            probs = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, p, d)
        x = x + _vision_dense(c, d, self.dtype, "attn_proj")(ctx)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = _vision_dense(c, int(d * c.mlp_ratio), self.dtype, "fc1")(h)
        h = _ACT[c.hidden_act](h)
        h = _vision_dense(c, d, self.dtype, "fc2")(h)
        return x + h


class _ScannedVisionBlock(nn.Module):
    config: Qwen2VLVisionConfig
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1

    @nn.compact
    def __call__(self, x, _, cos, sin):
        return Qwen2VLVisionBlock(
            self.config, dtype=self.dtype, grid_t=self.grid_t, name="block"
        )(x, cos, sin), None


class Qwen2VLVisionTower(nn.Module):
    """[N, P, patch_dim] flattened patches (one static grid) ->
    [N, P/merge², hidden_size] merged vision tokens."""

    config: Qwen2VLVisionConfig
    grid_thw: Tuple[int, int, int] = (1, 16, 16)  # static patch grid
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True

    @nn.compact
    def __call__(self, patches: Array, train: bool = False):
        c = self.config
        n, p, _ = patches.shape
        x = nn.Dense(c.embed_dim, use_bias=False, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        cos_np, sin_np = vision_rotary_tables(self.grid_thw, c.head_dim,
                                              c.spatial_merge_size, c.rope_theta)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        if self.scan_layers:
            Scanned = nn.scan(
                _ScannedVisionBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.depth,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            x, _ = Scanned(c, dtype=self.dtype, grid_t=self.grid_thw[0],
                           name="blocks")(x, None, cos, sin)
        else:
            for i in range(c.depth):
                x = Qwen2VLVisionBlock(c, dtype=self.dtype, grid_t=self.grid_thw[0],
                                       name=f"block_{i}")(x, cos, sin)
        # PatchMerger: merge-order layout makes each 2x2 spatial group
        # CONSECUTIVE, so the merge is one reshape
        m2 = c.spatial_merge_size**2
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_q")(x).astype(self.dtype)
        x = x.reshape(n, p // m2, m2 * c.embed_dim)
        x = nn.Dense(m2 * c.embed_dim, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="merger_fc2")(x)
        return x


# ---------------------------------------------------------------------------
# Qwen2.5-VL vision tower (window attention variant)
# ---------------------------------------------------------------------------

def window_permutation(grid_thw: Tuple[int, int, int], merge: int,
                       win_units: int) -> Tuple[np.ndarray, int, int]:
    """Static patch-level permutation into window order (HF get_window_index
    for one static grid, padding-free: the pinned resolution must make the
    merged grid divisible by the window size). Returns
    (patch_perm [P], n_windows, patches_per_window)."""
    t, h, w = grid_thw
    gh, gw = h // merge, w // merge
    if gh % win_units or gw % win_units:
        raise ValueError(
            f"merged grid {gh}x{gw} not divisible by window {win_units} — pin "
            f"image_size to a multiple of {win_units * merge * 14} px"
        )
    nwh, nww = gh // win_units, gw // win_units
    idx = np.arange(t * gh * gw).reshape(t, nwh, win_units, nww, win_units)
    merged_perm = idx.transpose(0, 1, 3, 2, 4).reshape(-1)  # merged-token order
    m2 = merge * merge
    patch_perm = (merged_perm[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
    return patch_perm, t * nwh * nww, win_units * win_units * m2


class Qwen25VLVisionBlock(nn.Module):
    config: Qwen25VLVisionConfig
    n_windows: int = 1
    win_patches: int = 1
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1  # full-attention layers stay within each temporal frame
    # (HF cu_seqlens = repeat(h*w, t)); windows never span frames by layout

    @nn.compact
    def __call__(self, x: Array, is_full, cos: Array, sin: Array):
        c = self.config
        n, p, d = x.shape
        hd = c.head_dim
        h = RMSNorm(1e-6, name="norm1")(x).astype(self.dtype)
        # projections happen OUTSIDE the span choice so both lax.cond
        # branches are pure math over the same tensors
        qkv = _vision_dense(c, 3 * d, self.dtype, "qkv")(h)
        q, k, v = (t.reshape(n, p, c.num_heads, hd) for t in jnp.split(qkv, 3, axis=-1))
        cb, sb = cos[None, :, None, :], sin[None, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cb + _rotate_half(qf) * sb).astype(self.dtype)
        k = (kf * cb + _rotate_half(kf) * sb).astype(self.dtype)

        def _core(q, k, v, keep=None):  # [M, L, H, hd] dense attention
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
            if keep is not None:
                s = jnp.where(keep[None, None], s, -1e30)
            probs = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            return jnp.einsum("nhqk,nkhd->nqhd", probs, v)

        def full_core(args):
            if c.attention_impl == "pallas":
                from nexus_tpu.ops.flash_attention import flash_vision_attention

                seg_ids = (np.arange(p) // (p // self.grid_t) + 1
                           if self.grid_t > 1 else np.ones((p,), np.int32))
                return flash_vision_attention(
                    *args, jnp.asarray(seg_ids, jnp.int32)).reshape(n, p, d)
            keep = None
            if self.grid_t > 1:  # static per-frame block-diagonal mask
                seg = np.arange(p) // (p // self.grid_t)
                keep = jnp.asarray(seg[:, None] == seg[None, :])
            return _core(*args, keep=keep).reshape(n, p, d)

        def window_core(args):
            nw, wp = self.n_windows, self.win_patches
            qw, kw, vw = (t.reshape(n * nw, wp, c.num_heads, hd) for t in args)
            return _core(qw, kw, vw).reshape(n, p, d)

        if isinstance(is_full, jnp.ndarray):
            ctx = jax.lax.cond(is_full, full_core, window_core, (q, k, v))
        else:
            ctx = full_core((q, k, v)) if is_full else window_core((q, k, v))
        x = x + _vision_dense(c, d, self.dtype, "attn_proj")(ctx)
        h = RMSNorm(1e-6, name="norm2")(x).astype(self.dtype)
        gate = _vision_dense(c, c.intermediate_size, self.dtype, "gate_proj")(h)
        up = _vision_dense(c, c.intermediate_size, self.dtype, "up_proj")(h)
        act = _ACT.get(c.hidden_act, nn.silu)
        down = _vision_dense(c, d, self.dtype, "down_proj")(act(gate) * up)
        return x + down


class _ScannedVision25Block(nn.Module):
    config: Qwen25VLVisionConfig
    n_windows: int = 1
    win_patches: int = 1
    dtype: jnp.dtype = jnp.float32
    grid_t: int = 1

    @nn.compact
    def __call__(self, x, is_full, cos, sin):
        out = Qwen25VLVisionBlock(
            self.config, n_windows=self.n_windows, win_patches=self.win_patches,
            dtype=self.dtype, grid_t=self.grid_t, name="block",
        )(x, is_full, cos, sin)
        return out, None


class Qwen25VLVisionTower(nn.Module):
    """[N, P, patch_dim] (one static grid) -> [N, P/merge², out_hidden_size]
    with static window-permuted attention (HF cu_window_seqlens parity,
    padding-free by pinned resolution)."""

    config: Qwen25VLVisionConfig
    grid_thw: Tuple[int, int, int] = (1, 16, 16)
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True

    @nn.compact
    def __call__(self, patches: Array, train: bool = False):
        c = self.config
        n, p, _ = patches.shape
        win_units = c.window_size // c.spatial_merge_size // c.patch_size
        perm, n_windows, win_patches = window_permutation(
            self.grid_thw, c.spatial_merge_size, win_units
        )
        x = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype, name="patch_embed")(
            patches.astype(self.dtype)
        )
        cos_np, sin_np = vision_rotary_tables(self.grid_thw, c.head_dim,
                                              c.spatial_merge_size, c.rope_theta)
        # permute tokens AND their rotary rows into window order (static gather)
        x = x[:, jnp.asarray(perm)]
        cos = jnp.asarray(cos_np[perm])
        sin = jnp.asarray(sin_np[perm])
        is_full = np.zeros((c.depth,), bool)
        is_full[[i for i in c.fullatt_block_indexes if i < c.depth]] = True
        if self.scan_layers:
            Scanned = nn.scan(
                _ScannedVision25Block,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.depth,
                in_axes=(0, nn.broadcast, nn.broadcast),
            )
            x, _ = Scanned(c, n_windows=n_windows, win_patches=win_patches,
                           dtype=self.dtype, grid_t=self.grid_thw[0],
                           name="blocks")(
                x, jnp.asarray(is_full), cos, sin
            )
        else:
            for i in range(c.depth):
                x = Qwen25VLVisionBlock(
                    c, n_windows=n_windows, win_patches=win_patches,
                    dtype=self.dtype, grid_t=self.grid_thw[0], name=f"block_{i}",
                )(x, bool(is_full[i]), cos, sin)
        m2 = c.spatial_merge_size**2
        x = RMSNorm(1e-6, name="ln_q")(x).astype(self.dtype)
        x = x.reshape(n, p // m2, m2 * c.hidden_size)
        x = nn.Dense(m2 * c.hidden_size, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c.out_hidden_size, dtype=self.dtype, name="merger_fc2")(x)
        # reverse the window permutation at merged-token granularity
        merged_perm = perm.reshape(-1, m2)[:, 0] // m2
        inv = np.argsort(merged_perm)
        return x[:, jnp.asarray(inv)]


# ---------------------------------------------------------------------------
# text trunk (Qwen2 + M-RoPE)
# ---------------------------------------------------------------------------

class Qwen2VLTextAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, cos, sin, return_weights=False):
        from nexus_tpu.models.lora import lora_dense

        c = self.config
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        hd = c.hidden_size // n_q
        if return_weights:
            # fused megakernel path (ops/fused_decoder.py): identical param
            # tree, raw packed projections handed to the kernel (LoRA
            # adapters merge into the effective kernels)
            from nexus_tpu.models.llama import _fused_dense_factory

            dense = _fused_dense_factory(c)
            wq, bq = dense(n_q * hd, True, name="q_proj")(
                c.hidden_size, self.dtype)
            wk, bk = dense(n_kv * hd, True, name="k_proj")(
                c.hidden_size, self.dtype)
            wv, bv = dense(n_kv * hd, True, name="v_proj")(
                c.hidden_size, self.dtype)
            wo, _ = dense(c.hidden_size, False, name="o_proj")(
                n_q * hd, self.dtype)
            return (jnp.concatenate([wq, wk, wv], axis=-1),
                    jnp.concatenate([bq, bk, bv]), wo)
        b, l, _ = x.shape
        q = lora_dense(c, n_q * hd, "q_proj", True, self.dtype)(x).reshape(b, l, n_q, hd)
        k = lora_dense(c, n_kv * hd, "k_proj", True, self.dtype)(x).reshape(b, l, n_kv, hd)
        v = lora_dense(c, n_kv * hd, "v_proj", True, self.dtype)(x).reshape(b, l, n_kv, hd)
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


class Qwen2VLTextLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, cos, sin):
        from nexus_tpu.models.llama import LlamaMLP, _RMSParams

        c = self.config
        n_q = c.num_attention_heads
        n_kv = c.num_key_value_heads or n_q
        hd = c.hidden_size // n_q
        if c.attention_impl == "fused":
            from nexus_tpu.ops.fused_decoder import (
                fused_decoder_block, fused_decoder_supported)

            fuse = fused_decoder_supported(c.hidden_size, n_q, n_kv, hd,
                                           x.shape[1])
        else:
            fuse = False
        if fuse:
            # megakernel with the M-RoPE tables passed straight through
            wqkv, bqkv, wo = Qwen2VLTextAttention(
                c, dtype=self.dtype, name="self_attn")(
                x, attention_mask, cos, sin, return_weights=True)
            rms_w = _RMSParams(name="input_layernorm")(c.hidden_size)
            x = fused_decoder_block(
                x, attention_mask, cos, sin, wqkv=wqkv, wo=wo, rms_w=rms_w,
                bqkv=bqkv, num_q_heads=n_q, num_kv_heads=n_kv, head_dim=hd,
                eps=c.rms_norm_eps)
        else:
            x = x + Qwen2VLTextAttention(c, dtype=self.dtype, name="self_attn")(
                RMSNorm(c.rms_norm_eps, name="input_layernorm")(x), attention_mask, cos, sin
            )
        return x + LlamaMLP(c, dtype=self.dtype, name="mlp")(
            RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        )


class _ScannedTextLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _, attention_mask, cos, sin):
        return Qwen2VLTextLayer(self.config, dtype=self.dtype, name="layer")(
            x, attention_mask, cos, sin
        ), None


# ---------------------------------------------------------------------------
# full backbone
# ---------------------------------------------------------------------------

class Qwen2VLBackbone(nn.Module):
    """input_ids + flattened image patches -> last_hidden_state, with vision
    tokens scattered over image-token positions (HF Qwen2VLModel parity)."""

    config: Qwen2VLConfig
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
        positions3: Optional[Array] = None,  # [3, B, L] M-RoPE ids
        train: bool = False,
    ):
        c = self.config
        tc = c.text
        if attention_mask is None:
            pad = tc.pad_token_id if tc.pad_token_id is not None else -1
            attention_mask = (input_ids != pad).astype(jnp.int32)
        if positions3 is None:
            pos = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            positions3 = jnp.broadcast_to(pos[None], (3, *pos.shape))
        embed = nn.Embed(tc.vocab_size, tc.hidden_size, dtype=self.dtype, name="embed_tokens")
        x = embed(input_ids)

        if pixel_patches is not None:
            tower_cls = (
                Qwen25VLVisionTower if c.variant == "qwen2.5-vl" else Qwen2VLVisionTower
            )
            tower = tower_cls(
                c.vision, grid_thw=self.grid_thw, dtype=self.dtype,
                scan_layers=self.scan_layers, name="visual",
            )
            vis = tower(pixel_patches, train)  # [N, K, D]
            vis_flat = vis.reshape(-1, vis.shape[-1])  # [N*K, D] in image order
            is_img = (input_ids == c.image_token_id) | (input_ids == c.video_token_id)
            # n-th image token position (row-major over the batch) takes the
            # n-th vision token — matches HF masked_scatter semantics
            order = jnp.cumsum(is_img.reshape(-1)) - 1
            order = jnp.clip(order, 0, vis_flat.shape[0] - 1)
            gathered = vis_flat[order].reshape(*input_ids.shape, -1)
            x = jnp.where(is_img[..., None], gathered.astype(x.dtype), x)

        hd = tc.hidden_size // tc.num_attention_heads
        cos, sin = mrope_cos_sin(positions3, hd, tc.rope_theta, c.mrope_section)
        if self.scan_layers:
            layer_cls = nn.remat(_ScannedTextLayer) if self.remat else _ScannedTextLayer
            Scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=tc.num_hidden_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            )
            x, _ = Scanned(tc, dtype=self.dtype, name="layers")(x, None, attention_mask, cos, sin)
        else:
            for i in range(tc.num_hidden_layers):
                x = Qwen2VLTextLayer(tc, dtype=self.dtype, name=f"layer_{i}")(
                    x, attention_mask, cos, sin
                )
        x = RMSNorm(tc.rms_norm_eps, name="norm")(x)
        return {"last_hidden_state": x}


# ---------------------------------------------------------------------------
# host-side M-RoPE position ids (HF get_rope_index parity)
# ---------------------------------------------------------------------------

def get_mrope_positions(
    input_ids: np.ndarray,  # [B, L]
    attention_mask: Optional[np.ndarray],
    grid_thw_per_image: List[Tuple[int, int, int]],
    *,
    image_token_id: int,
    video_token_id: int,
    merge: int = 2,
    temporal_scale: float = 1.0,
) -> np.ndarray:
    """[3, B, L] position ids: text runs are sequential (all components
    equal), each vision run gets its (t, h/merge, w/merge) grid coordinates
    offset past the preceding text (HF Qwen2VLModel.get_rope_index).

    ``temporal_scale`` is Qwen2.5-VL's video time spacing —
    tokens_per_second * second_per_grid_t (HF Qwen2_5_VLModel.get_rope_index
    time_tensor): temporal components step by that amount per temporal grid
    unit. 1.0 reproduces Qwen2-VL's plain arange(t)."""
    b, l = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    out = np.ones((3, b, l), np.int32)
    img_idx = 0
    for i in range(b):
        ids = input_ids[i][attention_mask[i] == 1]
        chunks = []
        st = 0
        pos_max = 0
        j = 0
        while j < len(ids):
            if ids[j] in (image_token_id, video_token_id):
                text_len = j - st
                chunks.append(np.tile(np.arange(text_len) + pos_max, (3, 1)))
                pos_max = pos_max + text_len
                t, h, w = grid_thw_per_image[img_idx]
                gh, gw = h // merge, w // merge
                t_steps = (np.arange(t) * temporal_scale).astype(np.int64)
                t_i = np.repeat(t_steps, gh * gw)
                h_i = np.tile(np.repeat(np.arange(gh), gw), t)
                w_i = np.tile(np.arange(gw), t * gh)
                chunks.append(np.stack([t_i, h_i, w_i]) + pos_max)
                pos_max = pos_max + max(int(t_steps[-1]) + 1, gh, gw)
                img_idx += 1
                j += t * gh * gw
                st = j
            else:
                j += 1
        if st < len(ids):
            text_len = len(ids) - st
            chunks.append(np.tile(np.arange(text_len) + pos_max, (3, 1)))
        llm_pos = np.concatenate(chunks, axis=1) if chunks else np.zeros((3, 0), np.int64)
        out[:, i, attention_mask[i] == 1] = llm_pos.astype(np.int32)
    return out
