"""Multimodal toolkit (parity: Nexus/modules/multimodal.py:151-1300):
backbone/processor registry, multimodal item normalization, instruction
templating, and the batching processor adapter.

TPU redesign: the processor emits STATIC-shape batches — text tokens padded
to max_length with `num_image_tokens` placeholder positions reserved per
image slot, pixels stacked to [B, max_images, H, W, C] (zero-padded when a
sample has fewer images). No chat-template string munging on the hot path.

Media handling is dependency-light: PIL for images; videos are raw
containers decoded via OpenCV (the decord replacement), or directories /
lists of pre-extracted frame images.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np

from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.multimodal")

IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_multimodal_item(item: Union[str, dict], media_root: Optional[str] = None) -> dict:
    """Normalize an item to {text, images, videos, pages} (parity:
    multimodal.py:714). Accepts a plain string, or a dict with any of
    text/image/images/video/videos/page/pages keys."""
    if isinstance(item, str):
        return {"text": item, "images": [], "videos": [], "pages": []}
    out = {
        "text": item.get("text", "") or "",
        "images": list(item.get("images") or ([item["image"]] if item.get("image") else [])),
        "videos": list(item.get("videos") or ([item["video"]] if item.get("video") else [])),
        "pages": list(item.get("pages") or ([item["page"]] if item.get("page") else [])),
    }
    if media_root:
        resolve = lambda p: p if os.path.isabs(str(p)) else os.path.join(media_root, str(p))
        out["images"] = [resolve(p) for p in out["images"]]
        out["videos"] = [resolve(p) for p in out["videos"]]
        out["pages"] = [resolve(p) for p in out["pages"]]
    return out


def apply_instruction(text: str, instruction: Optional[str], fmt: str = "{}{}") -> str:
    if not instruction:
        return text
    return fmt.format(instruction, text)


def load_image(path_or_image, image_size: int) -> np.ndarray:
    """-> [H, W, C] float32, CLIP-normalized."""
    from PIL import Image

    if isinstance(path_or_image, np.ndarray):
        img = Image.fromarray(path_or_image.astype(np.uint8))
    elif isinstance(path_or_image, Image.Image):
        img = path_or_image
    else:
        img = Image.open(str(path_or_image))
    img = img.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGE_MEAN) / IMAGE_STD


def load_video_frames(path, image_size: int, num_frames: int = 4,
                      return_meta: bool = False):
    """Videos as frame dirs / frame lists, or raw containers decoded via
    OpenCV (the decord replacement; parity: the reference's video-frame
    loading in Nexus/modules/multimodal.py + qwen-vl-utils).

    With ``return_meta`` also returns (sampled original frame indices, fps)
    — fps from the container when decodable, else the HF fallback 24.0."""
    if isinstance(path, (list, tuple)):
        frames = list(path)
    elif os.path.isdir(str(path)):
        frames = [os.path.join(path, f) for f in sorted(os.listdir(path))
                  if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    elif os.path.isfile(str(path)):
        return _decode_video_frames(str(path), image_size, num_frames, return_meta)
    else:
        raise ValueError(f"video {path!r}: not a frame dir, frame list, or video file")
    if not frames:
        return ([], [], 24.0) if return_meta else []
    idx = np.linspace(0, len(frames) - 1, min(num_frames, len(frames))).astype(int)
    loaded = [load_image(frames[i], image_size) for i in idx]
    return (loaded, idx.tolist(), 24.0) if return_meta else loaded


def _decode_video_frames(path: str, image_size: int, num_frames: int,
                         return_meta: bool = False):
    """Uniformly sample + CLIP-normalize frames straight out of a container."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise ValueError(
            f"video {path!r}: raw container decode needs OpenCV; "
            "pre-extract frames into a directory instead"
        ) from e
    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        raise ValueError(f"video {path!r}: could not decode (0 frames reported)")
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 24.0
    out, indices = [], []
    for fi in np.linspace(0, total - 1, min(num_frames, total)).astype(int):
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(fi))
        ok, frame = cap.read()
        if not ok:
            break
        out.append(load_image(frame[:, :, ::-1], image_size))  # BGR -> RGB
        indices.append(int(fi))
    cap.release()
    return (out, indices, fps) if return_meta else out


class MultimodalProcessorAdapter:
    """Batch normalized items to static device arrays
    (parity: MultimodalProcessorAdapter, multimodal.py:1144+).

    Output feed:
        input_ids / attention_mask   [B, L]
        pixel_values                 [B, max_images, H, W, C]
        image_slot_mask              [B, L]  (1 at reserved image positions)
    """

    def __init__(
        self,
        tokenizer,
        image_size: int = 224,
        num_image_tokens: int = 64,
        max_length: int = 256,
        max_images: int = 1,
        num_video_frames: int = 4,
        image_token: str = "<image>",
    ):
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.num_image_tokens = num_image_tokens
        self.max_length = max_length
        self.max_images = max_images
        self.num_video_frames = num_video_frames
        self.image_token = image_token

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        b = len(items)
        pad_id = self.tokenizer.pad_token_id or 0
        ids = np.full((b, self.max_length), pad_id, np.int32)
        mask = np.zeros((b, self.max_length), np.int32)
        slot = np.zeros((b, self.max_length), np.int32)
        pixels = np.zeros(
            (b, self.max_images, self.image_size, self.image_size, 3), np.float32
        )
        for i, item in enumerate(items):
            images = [load_image(p, self.image_size) for p in item.get("images", [])]
            for v in item.get("videos", []):
                images += load_video_frames(v, self.image_size, self.num_video_frames)
            for p in item.get("pages", []):
                images.append(load_image(p, self.image_size))
            images = images[: self.max_images]
            n_img = len(images)
            for j, im in enumerate(images):
                pixels[i, j] = im
            text_enc = self.tokenizer(
                item.get("text", ""), truncation=True,
                max_length=self.max_length - n_img * self.num_image_tokens,
                add_special_tokens=True,
            )["input_ids"]
            # layout: [image slots][text tokens]
            off = 0
            slots = n_img * self.num_image_tokens
            slot[i, :slots] = 1
            mask[i, : slots + len(text_enc)] = 1
            ids[i, slots : slots + len(text_enc)] = text_enc[: self.max_length - slots]
        return {
            "input_ids": ids,
            "attention_mask": mask,
            "pixel_values": pixels,
            "image_slot_mask": slot,
        }


def qwen2vl_image_to_patches(
    frames: np.ndarray, patch_size: int = 14, temporal_patch_size: int = 2,
    merge: int = 2,
) -> np.ndarray:
    """[T, H, W, C] normalized frames -> [P, C*tps*ps*ps] flattened patches in
    the Qwen2-VL merge-group order (exact HF image-processor layout, so the
    converted Conv3d patch-embed weights see identical inputs)."""
    patches = frames.transpose(0, 3, 1, 2)  # [T, C, H, W]
    if patches.shape[0] % temporal_patch_size != 0:
        reps = np.repeat(
            patches[-1][None], temporal_patch_size - patches.shape[0] % temporal_patch_size, axis=0
        )
        patches = np.concatenate([patches, reps], axis=0)
    t, c, h, w = patches.shape
    grid_t = t // temporal_patch_size
    grid_h, grid_w = h // patch_size, w // patch_size
    patches = patches.reshape(
        grid_t, temporal_patch_size, c,
        grid_h // merge, merge, patch_size,
        grid_w // merge, merge, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return patches.reshape(
        grid_t * grid_h * grid_w, c * temporal_patch_size * patch_size**2
    ).astype(np.float32)


class Qwen2VLProcessorAdapter:
    """Static-shape batching for the Qwen2-VL backbone (parity role:
    MultimodalProcessorAdapter's qwen2-vl path, multimodal.py:1144+).

    Resolution is PINNED to image_size x image_size so every image yields the
    same static (1, g, g) patch grid (the TPU answer to HF's dynamic
    smart_resize). Layout per sample: [vision_start][image tokens][text].

    With ``grid_t > 1`` the adapter runs in VIDEO mode: every vision entry is
    ONE temporal block of grid_t*tps frames — videos sample that many frames
    (true temporal patching + temporal M-RoPE, HF pixel_values_videos
    parity), images replicate their frame. The backbone must be built with
    the matching grid_thw=(grid_t, g, g); image mode and video mode cannot
    mix in one static program, mirroring how the model pins one patch grid.

    Output feed: input_ids / attention_mask [B, L], positions3 [3, B, L]
    (M-RoPE ids), pixel_patches [N_blocks_total, P, patch_dim] in batch
    order (absent for text-only batches).
    """

    def __init__(
        self,
        tokenizer,
        image_size: int = 224,
        patch_size: int = 14,
        temporal_patch_size: int = 2,
        spatial_merge_size: int = 2,
        max_length: int = 256,
        num_video_frames: int = 4,
        image_token_id: int = 151655,
        video_token_id: int = 151656,
        vision_start_token_id: int = 151652,
        vision_end_token_id: int = 151653,
        use_chat_template: bool = False,
        system_prompt: str = "You are a helpful assistant.",
        grid_t: int = 1,
        temporal_scale: float = 1.0,  # Qwen2.5-VL: tokens_per_second * sec/grid
        video_timestamps: bool = False,  # Qwen3-VL: '<t.t seconds>' text +
        # one (1, g, g) block per temporal patch group (HF Qwen3VLProcessor
        # video_placeholder layout — get_rope_index splits videos to t=1)
    ):
        assert image_size % (patch_size * spatial_merge_size) == 0
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge = spatial_merge_size
        self.max_length = max_length
        self.num_video_frames = num_video_frames
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_token_id = vision_start_token_id
        self.vision_end_token_id = vision_end_token_id
        self.use_chat_template = use_chat_template
        self.temporal_scale = float(temporal_scale)
        self.video_timestamps = video_timestamps
        if video_timestamps and grid_t != 1:
            raise ValueError("timestamp-interleaved videos use per-block (1, g, g) "
                             "grids; grid_t must stay 1")
        g = image_size // patch_size
        self.grid_t = int(grid_t)
        self.grid_thw = (self.grid_t, g, g)
        self.frames_per_block = self.grid_t * temporal_patch_size
        self.tokens_per_image = self.grid_t * (g // spatial_merge_size) ** 2
        # Qwen conversation layout (parity: the reference's chat-template
        # processor path, Nexus/modules/multimodal.py:1144+). Tokenized ONCE
        # here; per-item assembly stays token-level (no string munging on the
        # hot path). The trailing assistant turn makes last-token pooling
        # pool at the generation position, as the reference's template does.
        if use_chat_template:
            enc = lambda s: list(tokenizer(s, add_special_tokens=False)["input_ids"])
            self.chat_prefix_ids = enc(
                f"<|im_start|>system\n{system_prompt}<|im_end|>\n<|im_start|>user\n"
            )
            self.chat_suffix_ids = enc("<|im_end|>\n<|im_start|>assistant\n")
        else:
            self.chat_prefix_ids = []
            self.chat_suffix_ids = []

    def _timestamp_video_blocks(self, video) -> List[tuple]:
        """Qwen3-VL video layout (HF Qwen3VLProcessor video_placeholder):
        sample num_video_frames raw frames, group them into temporal patch
        pairs — each pair is ONE (1, g, g) block — and prefix every block
        with its '<t.t seconds>' timestamp text (mean of the pair's frame
        times, HF _calculate_timestamps)."""
        tps = self.temporal_patch_size
        n = -(-self.num_video_frames // tps) * tps  # round up to tps multiple
        frames, indices, fps = load_video_frames(
            video, self.image_size, n, return_meta=True
        )
        if not frames:
            return []
        while len(frames) % tps:
            frames.append(frames[-1])
            indices.append(indices[-1])
        out = []
        for b in range(0, len(frames), tps):
            ts = (indices[b] / fps + indices[b + tps - 1] / fps) / 2
            prefix = list(self.tokenizer(
                f"<{ts:.1f} seconds>", add_special_tokens=False
            )["input_ids"])
            out.append((np.stack(frames[b : b + tps]), self.video_token_id, prefix))
        return out

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        from nexus_tpu.models.qwen2_vl import get_mrope_positions

        b = len(items)
        pad_id = self.tokenizer.pad_token_id or 0
        ids = np.full((b, self.max_length), pad_id, np.int32)
        mask = np.zeros((b, self.max_length), np.int32)
        all_patches: List[np.ndarray] = []
        grids: List[tuple] = []
        for i, item in enumerate(items):
            # ([T, H, W, C] frames, placeholder id, prefix token ids)
            blocks: List[tuple] = []
            if self.video_timestamps:
                images = [load_image(p, self.image_size) for p in item.get("images", [])]
                for p in item.get("pages", []):
                    images.append(load_image(p, self.image_size))
                blocks = [(im[None], self.image_token_id, []) for im in images]
                for v in item.get("videos", []):
                    blocks += self._timestamp_video_blocks(v)
            elif self.grid_t == 1:
                images = [load_image(p, self.image_size) for p in item.get("images", [])]
                for v in item.get("videos", []):
                    images += load_video_frames(v, self.image_size, self.num_video_frames)
                for p in item.get("pages", []):
                    images.append(load_image(p, self.image_size))
                blocks = [(im[None], self.image_token_id, []) for im in images]
            else:  # video mode: one temporal block per vision entry
                fpb = self.frames_per_block
                for p in list(item.get("images", [])) + list(item.get("pages", [])):
                    im = load_image(p, self.image_size)
                    blocks.append((np.repeat(im[None], fpb, axis=0), self.image_token_id, []))
                for v in item.get("videos", []):
                    frames = load_video_frames(v, self.image_size, fpb)
                    if not frames:
                        continue
                    arr = np.stack(frames)
                    if arr.shape[0] < fpb:  # short clip: repeat the last frame
                        arr = np.concatenate(
                            [arr, np.repeat(arr[-1:], fpb - arr.shape[0], axis=0)]
                        )
                    blocks.append((arr, self.video_token_id, []))
            row: List[int] = list(self.chat_prefix_ids)
            tail = len(self.chat_suffix_ids)
            for frames, placeholder, prefix_ids in blocks:
                is_video_ts = self.video_timestamps and placeholder == self.video_token_id
                need = (len(prefix_ids) + 1 + self.tokens_per_image
                        + (1 if self.use_chat_template or is_video_ts else 0))
                if len(row) + need + tail > self.max_length:
                    break
                all_patches.append(qwen2vl_image_to_patches(
                    frames, self.patch_size, self.temporal_patch_size, self.merge
                ))
                grids.append(self.grid_thw)
                row.extend(prefix_ids)
                row.append(self.vision_start_token_id)
                row.extend([placeholder] * self.tokens_per_image)
                if self.use_chat_template or is_video_ts:
                    row.append(self.vision_end_token_id)
            text_ids = self.tokenizer(
                item.get("text", ""), truncation=True,
                max_length=max(self.max_length - len(row) - tail, 0),
                add_special_tokens=not self.use_chat_template,
            )["input_ids"]
            row.extend(text_ids)
            row.extend(self.chat_suffix_ids)
            row = row[: self.max_length]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        positions3 = get_mrope_positions(
            ids, mask, grids, image_token_id=self.image_token_id,
            video_token_id=self.video_token_id, merge=self.merge,
            temporal_scale=self.temporal_scale,
        )
        feed = {"input_ids": ids, "attention_mask": mask, "positions3": positions3}
        if all_patches:
            patches = np.stack(all_patches)
            # bucket the VISION-ROW count: dynamically micro-batched serving
            # boards arbitrary image-count mixes, and a jit program per
            # count is the round-4 compile-storm failure mode (remote
            # compiles 6-12 s p50). Pow-2 up to 4, then multiples of 4 —
            # bounded program count, <= 33% padded vision rows worst case.
            # Pad rows carry NO image tokens in input_ids, so the backbone's
            # cumsum scatter never gathers them (dead compute only).
            n = patches.shape[0]
            target = (1 if n <= 1 else 2 if n <= 2 else 4 if n <= 4
                      else -(-n // 4) * 4)
            if target != n:
                patches = np.concatenate(
                    [patches, np.zeros((target - n, *patches.shape[1:]),
                                       patches.dtype)])
            feed["pixel_patches"] = patches
        return feed


class LlavaNextProcessorAdapter:
    """Static-shape AnyRes batching for the LLaVA-Next backbone (parity role:
    MultimodalProcessorAdapter's llava-next path, multimodal.py:1144+).

    Per image: best-fit resolution from image_grid_pinpoints, aspect-
    preserving resize + centered pad, divide into tile_px tiles, plus the
    squash-resized base tile FIRST (HF image-processor tile order). The
    batch's tiles pad to ``max_tiles`` so the device program is one static
    [max_tiles, H, W, C] tower forward regardless of the AnyRes mix; the
    gather plan never references pad tiles.

    Output feed: input_ids / attention_mask / pack_gather [B, L],
    pixel_values [max_tiles, H, W, C].
    """

    def __init__(
        self,
        tokenizer,
        config,  # LlavaNextConfig
        max_length: int = 1024,
        max_tiles: int = 10,
        num_video_frames: int = 4,
    ):
        self.tokenizer = tokenizer
        self.config = config
        self.max_length = max_length
        self.max_tiles = max_tiles
        self.num_video_frames = num_video_frames

    def _anyres_tiles(self, img) -> "tuple[list[np.ndarray], tuple[int, int]]":
        from PIL import Image

        from nexus_tpu.models.llava_next import select_best_resolution

        if isinstance(img, np.ndarray):
            img = Image.fromarray(img.astype(np.uint8))
        elif not isinstance(img, Image.Image):
            img = Image.open(str(img))
        img = img.convert("RGB")
        ow, oh = img.size
        tile_px = self.config.vision.image_size
        bh, bw = select_best_resolution((oh, ow), self.config.image_grid_pinpoints)
        scale = min(bw / ow, bh / oh)
        nw, nh = int(ow * scale), int(oh * scale)
        resized = np.zeros((bh, bw, 3), np.float32)
        patch = np.asarray(img.resize((nw, nh), Image.BICUBIC), np.float32) / 255.0
        y0, x0 = (bh - nh) // 2, (bw - nw) // 2
        resized[y0 : y0 + nh, x0 : x0 + nw] = patch
        resized = (resized - IMAGE_MEAN) / IMAGE_STD
        tiles = [load_image(img, tile_px)]  # base tile first (HF order)
        for r in range(0, bh, tile_px):
            for c in range(0, bw, tile_px):
                tiles.append(resized[r : r + tile_px, c : c + tile_px])
        return tiles, (oh, ow)

    def __call__(self, items: List[dict]) -> Dict[str, np.ndarray]:
        from nexus_tpu.models.llava_next import build_pack_gather, image_feature_lens

        c = self.config
        b = len(items)
        pad_id = self.tokenizer.pad_token_id or 0
        ids = np.full((b, self.max_length), pad_id, np.int32)
        mask = np.zeros((b, self.max_length), np.int32)
        all_tiles: List[np.ndarray] = []
        sizes: List[tuple] = []
        for i, item in enumerate(items):
            media = list(item.get("images", [])) + list(item.get("pages", []))
            row: List[int] = []
            for p in media:
                tiles, size = self._anyres_tiles(p)
                n_tok = image_feature_lens([size], c)[0]
                if (len(all_tiles) + len(tiles) > self.max_tiles
                        or len(row) + n_tok > self.max_length):
                    break
                all_tiles.extend(tiles)
                sizes.append(size)
                row.extend([c.image_token_id] * n_tok)
            text_ids = self.tokenizer(
                item.get("text", ""), truncation=True,
                max_length=self.max_length - len(row), add_special_tokens=True,
            )["input_ids"]
            row.extend(text_ids)
            row = row[: self.max_length]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        tile_px = c.vision.image_size
        pixels = np.zeros((self.max_tiles, tile_px, tile_px, 3), np.float32)
        for j, t in enumerate(all_tiles):
            pixels[j] = t
        gather = build_pack_gather(ids, sizes, c, n_tiles_total=self.max_tiles)
        return {
            "input_ids": ids,
            "attention_mask": mask,
            "pixel_values": pixels,
            "pack_gather": gather,
        }


# Qwen-VL model families sharing the patch-grid processor + M-RoPE encode
# path (parity: the reference's CHAT_TEMPLATE_MODEL_TYPES /
# VIDEO_MODEL_TYPES sets listing qwen3_5 beside qwen3_vl,
# Nexus/modules/multimodal.py:16,32)
QWEN_VL_FAMILY = ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5")
# variants using the timestamp-interleaved video layout + official chat
# template (reference QWEN_OFFICIAL_CHAT_MODEL_TYPES: qwen3_vl, qwen3_5)
QWEN3_TIMESTAMP_VARIANTS = ("qwen3-vl", "qwen3.5")

_BACKBONE_REGISTRY: dict = {}


def register_multimodal_backbone(name: str):
    def deco(fn):
        _BACKBONE_REGISTRY[name] = fn
        return fn

    return deco


def load_multimodal_backbone(model_type: str, **kwargs):
    """Backbone factory by model type (parity: multimodal.py:172-512's
    qwen2-vl/qwen2.5-vl/... registry — here 'nexus-vlm' is the in-house
    TPU-native VLM; HF VLM families convert offline into its layout)."""
    if model_type not in _BACKBONE_REGISTRY:
        raise ValueError(
            f"unknown multimodal backbone {model_type!r}; known: {sorted(_BACKBONE_REGISTRY)}"
        )
    return _BACKBONE_REGISTRY[model_type](**kwargs)


@register_multimodal_backbone("nexus-vlm")
def _build_nexus_vlm(config=None, dtype=None, **kw):
    import jax.numpy as jnp

    from nexus_tpu.models.vlm import VLMBackbone, VLMConfig

    config = config or VLMConfig.tiny()
    return VLMBackbone(config, dtype=dtype or jnp.bfloat16)


@register_multimodal_backbone("qwen2-vl")
def _build_qwen2_vl(config=None, dtype=None, grid_thw=(1, 16, 16), **kw):
    import jax.numpy as jnp

    from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone

    return Qwen2VLBackbone(config, grid_thw=tuple(grid_thw), dtype=dtype or jnp.bfloat16)


# Qwen2.5-VL rides the same backbone with the windowed-attention tower
# (config.variant selects it; parity-tested in tests/test_qwen2_vl.py)
_BACKBONE_REGISTRY["qwen2.5-vl"] = _BACKBONE_REGISTRY["qwen2-vl"]


@register_multimodal_backbone("llava-next")
def _build_llava_next(config=None, dtype=None, **kw):
    import jax.numpy as jnp

    from nexus_tpu.models.llava_next import LlavaNextBackbone, LlavaNextConfig

    return LlavaNextBackbone(config or LlavaNextConfig(), dtype=dtype or jnp.bfloat16)


@register_multimodal_backbone("qwen3-vl")
def _build_qwen3_vl(config=None, dtype=None, grid_thw=(1, 16, 16), **kw):
    import jax.numpy as jnp

    from nexus_tpu.models.qwen3_vl import Qwen3VLBackbone

    return Qwen3VLBackbone(config, grid_thw=tuple(grid_thw), dtype=dtype or jnp.bfloat16)


# Qwen3.5 (HF model_type 'qwen3_5') rides the qwen3-vl backbone: same
# deepstack vision tower + interleaved M-RoPE text trunk; config.variant
# records which family the checkpoint declared (ref multimodal.py:21,28)
_BACKBONE_REGISTRY["qwen3.5"] = _BACKBONE_REGISTRY["qwen3-vl"]
