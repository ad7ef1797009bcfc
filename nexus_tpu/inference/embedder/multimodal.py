"""Multimodal embedder inference (parity: Nexus/inference/embedder/
multimodal_retrieval/generic.py:26-287): batched encode of normalized
multimodal items with query/corpus instruction split.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import numpy as np

from nexus_tpu.modules.multimodal import (
    MultimodalProcessorAdapter,
    apply_instruction,
    normalize_multimodal_item,
)
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.multimodal")


class MultimodalEmbedder:
    def __init__(
        self,
        model=None,
        model_name_or_path: Optional[str] = None,
        tokenizer=None,
        batch_size: int = 32,
        max_length: int = 128,
        max_images: int = 1,
        media_root: Optional[str] = None,
        query_instruction: Optional[str] = None,
        corpus_instruction: Optional[str] = None,
        use_chat_template: bool = False,
        infer_mode: str = "normal",
        attention_impl: Optional[str] = None,
        quantized: bool = False,
    ):
        """``attention_impl``: serve-time override of BOTH towers' attention
        paths — text trunk: 'fused' = ops/fused_decoder.py megakernel with
        the M-RoPE tables in-kernel | 'pallas' flash | 'xla'; vision tower:
        'fused'/'pallas' both select the flash kernel
        (ops/flash_attention.py::flash_vision_attention). None keeps the
        checkpoint's configuration. ``quantized``: int8 W8A8 serving of the
        text trunk AND (for Qwen towers) the vision block projections via
        the path-scoped conversion (models/quantize.py::quantize_vlm_params
        include_vision); composes with attention_impl like the text
        engines."""
        from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
            BiMultimodalEmbedderModel,
        )

        if model is None:
            model = BiMultimodalEmbedderModel.from_pretrained(model_name_or_path)
        if attention_impl is not None:
            from nexus_tpu.inference.embedder.text_retrieval import _override_attention_impl

            _override_attention_impl(model, attention_impl)
        if quantized:
            from nexus_tpu.models.quantize import quantize_model

            quantize_model(model)
        self.model = model
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.tokenizer = tokenizer
        c = model.vlm_config
        if getattr(model, "backbone_type", "nexus-vlm") in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5"):
            from nexus_tpu.modules.multimodal import Qwen2VLProcessorAdapter

            t, h, w = model.grid_thw
            self.processor = Qwen2VLProcessorAdapter(
                tokenizer,
                image_size=h * c.vision.patch_size,
                patch_size=c.vision.patch_size,
                temporal_patch_size=c.vision.temporal_patch_size,
                spatial_merge_size=c.vision.spatial_merge_size,
                max_length=max_length,
                image_token_id=c.image_token_id,
                video_token_id=c.video_token_id,
                vision_start_token_id=c.vision_start_token_id,
                vision_end_token_id=getattr(c, "vision_end_token_id", 151653),
                use_chat_template=use_chat_template,
                grid_t=t,
                # qwen3-vl videos: '<t.t seconds>' text before each (1,g,g)
                # temporal-pair block (HF Qwen3VLProcessor layout)
                video_timestamps=getattr(model, "backbone_type", "") in ("qwen3-vl", "qwen3.5"),
                # Qwen2.5-VL spaces video temporal M-RoPE by
                # tokens_per_second * second_per_grid_t (tps / fps, fps=2.0
                # HF processor default); Qwen2-VL uses plain arange(t)
                temporal_scale=(
                    getattr(c.vision, "tokens_per_second", 0)
                    * c.vision.temporal_patch_size / 2.0
                ) or 1.0,
            )
        else:
            self.processor = MultimodalProcessorAdapter(
                tokenizer, image_size=c.vision.image_size,
                num_image_tokens=c.num_image_tokens, max_length=max_length,
                max_images=max_images,
            )
        self.batch_size = batch_size
        self.media_root = media_root
        self.query_instruction = query_instruction
        self.corpus_instruction = corpus_instruction
        # 'normal' = jit (compile-on-first-shape); 'aot'/'onnx'/'tensorrt' =
        # explicitly lowered+compiled executables keyed by feed shapes (the
        # engine-parity alternative the eval runner exercises — same pattern
        # as the text engines' AOTSession)
        self.infer_mode = infer_mode
        self._encode_jit = jax.jit(
            lambda variables, feed: self.model.encode_feed(variables, feed)
        )
        self._aot_cache = {}

    def _encode(self, variables, feed):
        if self.infer_mode == "normal":
            return self._encode_jit(variables, feed)
        import jax.numpy as jnp

        key = tuple(
            (k, tuple(jnp.shape(v)), str(jnp.result_type(v))) for k, v in sorted(feed.items())
        )
        if key not in self._aot_cache:
            spec = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
                (variables, feed),
            )
            self._aot_cache[key] = self._encode_jit.lower(*spec).compile()
        return self._aot_cache[key](variables, feed)

    def _encode_items(self, items: List[dict]) -> np.ndarray:
        """Double-buffered: chunk i+1's host leg (PIL resize/patchify +
        tokenize + M-RoPE layout) runs while chunk i's compiled encode is on
        the device — jax dispatch is async, so the overlap needs no threads
        (the encode_stream pattern; on a 1-core host the image-preprocess
        leg is a large slice of end-to-end VLM serving time)."""
        reps = []
        pending = None  # (n_valid, un-fetched device output)
        for off in range(0, len(items), self.batch_size):
            chunk = items[off : off + self.batch_size]
            n = len(chunk)
            if n < self.batch_size:  # pad to static batch
                chunk = chunk + [{"text": "", "images": [], "videos": [], "pages": []}] * (
                    self.batch_size - n
                )
            feed = self.processor(chunk)
            out_dev = self._encode(self.model.variables, feed)  # async
            if pending is not None:
                reps.append(np.asarray(pending[1])[: pending[0]])
            pending = (n, out_dev)
        if pending is not None:
            reps.append(np.asarray(pending[1])[: pending[0]])
        return np.concatenate(reps, axis=0)

    def encode_queries(self, queries: Union[str, List], **kw) -> np.ndarray:
        single = not isinstance(queries, list)
        if single:
            queries = [queries]
        items = [normalize_multimodal_item(q, self.media_root) for q in queries]
        for it in items:
            it["text"] = apply_instruction(it["text"], self.query_instruction)
        out = self._encode_items(items)
        return out[0] if single else out

    def encode_corpus(self, corpus: Union[str, List], **kw) -> np.ndarray:
        single = not isinstance(corpus, list)
        if single:
            corpus = [corpus]
        items = [normalize_multimodal_item(c, self.media_root) for c in corpus]
        for it in items:
            it["text"] = apply_instruction(it["text"], self.corpus_instruction)
        out = self._encode_items(items)
        return out[0] if single else out

    encode = encode_corpus
