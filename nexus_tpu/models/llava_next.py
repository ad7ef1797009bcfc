"""LLaVA-Next (llava-v1.6) backbone in Flax — CLIP-ViT vision tower +
2-layer projector + Llama/Vicuna text trunk with AnyRes tiling.

Reference role: the 'llava-next' entry of the HF VLM backbone registry at
Nexus/modules/multimodal.py:172-512 (loaded there via
LlavaNextForConditionalGeneration). This is a TPU-first redesign, not a
port: HF's AnyRes feature packing (pack_image_features) is dynamic-shaped —
per-image unpadding produces ragged token counts, torch.cat on the host —
which XLA cannot compile. Here the ENTIRE pack is precomputed on the host as
a static gather-index plan (`build_pack_gather`): the device program is one
vision-tower forward over all tiles, one projector GEMM, one gather, one
where-merge into the token embeddings — fully static shapes, jit-compiled
once per (batch, tiles) bucket.

Numerics match HF exactly (tests/test_llava_next.py asserts parity of the
packed features and the full forward against the torch implementation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.config import AbsArguments
from nexus_tpu.models.llama import LlamaConfig, LlamaModel

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclass
class CLIPVisionConfig(AbsArguments):
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2


@dataclass
class LlavaNextConfig(AbsArguments):
    vision: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)
    text: LlamaConfig = field(default_factory=LlamaConfig)
    image_token_id: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"  # 'default' drops CLS
    image_grid_pinpoints: List[List[int]] = field(
        default_factory=lambda: [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
    )

    @classmethod
    def from_hf(cls, hf_config) -> "LlavaNextConfig":
        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        v = d["vision_config"]
        v = v if isinstance(v, dict) else v.to_dict()
        t = d["text_config"]
        t = t if isinstance(t, dict) else t.to_dict()
        import dataclasses as _dc

        vnames = {f.name for f in _dc.fields(CLIPVisionConfig)}
        return cls(
            vision=CLIPVisionConfig(**{k: x for k, x in v.items() if k in vnames}),
            text=LlamaConfig.from_hf(t),
            image_token_id=d.get("image_token_index", d.get("image_token_id", 32000)),
            vision_feature_layer=d.get("vision_feature_layer", -2),
            vision_feature_select_strategy=d.get("vision_feature_select_strategy", "default"),
            image_grid_pinpoints=[list(p) for p in d["image_grid_pinpoints"]],
        )

    @property
    def feature_depth(self) -> int:
        """Number of encoder layers actually run: HF takes
        hidden_states[vision_feature_layer] where index 0 is the embedding
        output and index i the output of layer i."""
        return self.vision_feature_layer % (self.vision.num_hidden_layers + 1)


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        n, d = c.num_attention_heads, c.hidden_size
        hd = d // n
        b, t, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x).reshape(b, t, n, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x).reshape(b, t, n, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x).reshape(b, t, n, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(ctx)


class CLIPLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h.astype(self.dtype))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h.astype(self.dtype))
        h = quick_gelu(h)
        return x + nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)


class _ScannedCLIPLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return CLIPLayer(self.config, dtype=self.dtype, name="layer")(x), None


class CLIPVisionTower(nn.Module):
    """[N, H, W, C] pixels -> [N, 1+P, D] hidden states after ``depth``
    encoder layers (HF hidden_states[depth]; NO post_layernorm — LLaVA
    extracts pre-final-norm features)."""

    config: CLIPVisionConfig
    depth: int  # layers to run (config.feature_depth of the parent)
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True

    @nn.compact
    def __call__(self, pixels: Array) -> Array:
        c = self.config
        n = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID", use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixels.astype(self.dtype))
        x = x.reshape(n, -1, c.hidden_size)  # [N, P, D] row-major patches
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, c.hidden_size)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1 + c.num_patches, c.hidden_size), jnp.float32,
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm")(x)
        x = x.astype(self.dtype)
        if self.scan_layers:
            Scanned = nn.scan(
                _ScannedCLIPLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
            )
            x, _ = Scanned(c, dtype=self.dtype, name="layers")(x, None)
        else:
            for i in range(self.depth):
                x = CLIPLayer(c, dtype=self.dtype, name=f"layer_{i}")(x)
        return x


# ---------------------------------------------------------------------------
# full backbone
# ---------------------------------------------------------------------------


class LlavaNextBackbone(nn.Module):
    """input_ids + AnyRes tiles + a host-built gather plan -> last_hidden_state.

    ``pixel_values``: [N_tiles, H, W, C] — every image's base tile plus its
    AnyRes crop tiles, concatenated in image order (HF layout).
    ``pack_gather``: [B, L] int32 from ``build_pack_gather`` — for each image
    placeholder position, the row of the flattened projected-feature table it
    takes (the table's final row is the learned image_newline embedding);
    arbitrary at text positions (masked out).
    """

    config: LlavaNextConfig
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: Array,  # [B, L]
        attention_mask: Optional[Array] = None,
        pixel_values: Optional[Array] = None,  # [N_tiles, H, W, C]
        pack_gather: Optional[Array] = None,  # [B, L]
        train: bool = False,
    ):
        c = self.config
        if attention_mask is None:
            pad = c.text.pad_token_id if c.text.pad_token_id is not None else -1
            attention_mask = (input_ids != pad).astype(jnp.int32)

        override_mask = override = None
        if pixel_values is not None:
            tower = CLIPVisionTower(
                c.vision, depth=c.feature_depth, dtype=self.dtype,
                scan_layers=self.scan_layers, name="vision_tower",
            )
            feats = tower(pixel_values)  # [N, 1+P, Dv]
            if c.vision_feature_select_strategy == "default":
                feats = feats[:, 1:]  # drop CLS
            feats = nn.Dense(c.text.hidden_size, dtype=self.dtype, name="projector_linear_1")(feats)
            feats = nn.gelu(feats, approximate=False)
            feats = nn.Dense(c.text.hidden_size, dtype=self.dtype, name="projector_linear_2")(feats)
            newline = self.param(
                "image_newline", nn.initializers.normal(0.02), (c.text.hidden_size,), jnp.float32
            )
            table = jnp.concatenate(
                [feats.reshape(-1, c.text.hidden_size), newline[None].astype(feats.dtype)], axis=0
            )  # [N*P + 1, D]
            override_mask = input_ids == c.image_token_id
            safe = jnp.clip(pack_gather, 0, table.shape[0] - 1)
            override = table[safe]  # [B, L, D]

        lm = LlamaModel(
            c.text, dtype=self.dtype, scan_layers=self.scan_layers,
            remat=self.remat, name="language_model",
        )
        return lm(
            input_ids, attention_mask,
            override_mask=override_mask, override_embeds=override,
        )


# ---------------------------------------------------------------------------
# host-side AnyRes plan (HF pack_image_features parity, as indices)
# ---------------------------------------------------------------------------


def select_best_resolution(
    original_size: Tuple[int, int], possible: Sequence[Sequence[int]]
) -> Tuple[int, int]:
    """Maximize effective (downscaled) resolution, then minimize waste
    (HF image_processing_utils.select_best_resolution semantics)."""
    oh, ow = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def anyres_grid_shape(
    image_size: Tuple[int, int], pinpoints: Sequence[Sequence[int]], tile: int
) -> Tuple[int, int]:
    """(tiles_high, tiles_wide) of the best-fit AnyRes resolution."""
    h, w = select_best_resolution(image_size, pinpoints)
    return h // tile, w // tile


def num_tiles(image_size, pinpoints, tile: int) -> int:
    """Tiles for one image INCLUDING the base tile (HF image_size_to_num_patches)."""
    nh, nw = anyres_grid_shape(image_size, pinpoints, tile)
    return nh * nw + 1


def _unpad_range(full: int, other_full: int, orig: int, other_orig: int) -> Tuple[int, int]:
    """Rows (or cols) kept by HF unpad_image along one axis."""
    scale = other_full / other_orig
    new = int(round(orig * scale, 7))
    pad = (full - new) // 2
    return pad, full - pad


def image_feature_lens(
    image_sizes: Sequence[Tuple[int, int]], config: LlavaNextConfig
) -> List[int]:
    """Packed token count per image (== placeholder count the processor emits)."""
    g = config.vision.grid
    out = []
    for oh, ow in image_sizes:
        nph, npw = anyres_grid_shape((oh, ow), config.image_grid_pinpoints, config.vision.image_size)
        gh, gw = nph * g, npw * g
        if ow / oh > gw / gh:
            r0, r1 = _unpad_range(gh, gw, oh, ow)
            c0, c1 = 0, gw
        else:
            c0, c1 = _unpad_range(gw, gh, ow, oh)
            r0, r1 = 0, gh
        out.append(g * g + (r1 - r0) * (c1 - c0 + 1))  # base + rows*(cols+newline)
    return out


def build_pack_gather(
    input_ids: np.ndarray,  # [B, L]
    image_sizes: Sequence[Tuple[int, int]],  # (h, w) per image, batch order
    config: LlavaNextConfig,
    n_tiles_total: Optional[int] = None,  # padded tile count when the batch
    # pads pixel_values to a static bucket (newline row sits after ALL tiles)
) -> np.ndarray:
    """[B, L] int32 gather plan: each image-placeholder position maps to a row
    of the flattened [N_tiles*P + 1] projected-feature table (last row =
    image_newline). Token order per image matches HF pack_image_features:
    base-tile features row-major, then each unpadded grid row followed by a
    newline. Images are consumed in batch row-major placeholder order."""
    g = config.vision.grid
    P = g * g
    pin = config.image_grid_pinpoints
    tile_px = config.vision.image_size

    plans: List[np.ndarray] = []
    tile_off = 0
    for oh, ow in image_sizes:
        nph, npw = anyres_grid_shape((oh, ow), pin, tile_px)
        gh, gw = nph * g, npw * g
        if ow / oh > gw / gh:
            r0, r1 = _unpad_range(gh, gw, oh, ow)
            c0, c1 = 0, gw
        else:
            c0, c1 = _unpad_range(gw, gh, ow, oh)
            r0, r1 = 0, gh
        base = np.arange(P, dtype=np.int64) + tile_off * P
        rows = []
        for r in range(r0, r1):
            cs = np.arange(c0, c1, dtype=np.int64)
            tiles = 1 + (r // g) * npw + cs // g  # +1: tile 0 is the base
            idx = (tile_off + tiles) * P + (r % g) * g + (cs % g)
            rows.append(np.concatenate([idx, [-1]]))  # -1 = newline sentinel
        plan = np.concatenate([base] + rows) if rows else base
        plans.append(plan)
        tile_off += nph * npw + 1

    if n_tiles_total is not None and n_tiles_total < tile_off:
        raise ValueError(f"n_tiles_total={n_tiles_total} < {tile_off} real tiles")
    newline_row = (n_tiles_total if n_tiles_total is not None else tile_off) * P
    flat_plan = np.concatenate(plans) if plans else np.zeros((0,), np.int64)
    flat_plan = np.where(flat_plan < 0, newline_row, flat_plan)

    out = np.full(input_ids.shape, newline_row, np.int32)
    holes = input_ids == config.image_token_id
    n_holes = int(holes.sum())
    if n_holes != flat_plan.shape[0]:
        raise ValueError(
            f"input has {n_holes} image placeholder tokens but the AnyRes plan "
            f"packs {flat_plan.shape[0]} feature tokens — image_sizes mismatch"
        )
    out[holes] = flat_plan.astype(np.int32)
    return out
