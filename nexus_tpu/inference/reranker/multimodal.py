"""Multimodal (VLM) reranker with yes/no-logit scoring (parity:
Nexus/evaluation/mmeb_v2/qwen3_vl_reranker.py + eval_reranker.py).

The reference prompts a Qwen3-VL chat model with the query + candidate and
reads sigmoid(w_yes·h - w_no·h) at the last position, where w_yes/w_no are
the LM-head rows of the "yes"/"no" tokens folded into one scoring vector
(get_binary_linear, qwen3_vl_reranker.py:120-131).

TPU redesign: no chat-template string munging — the pair renders as one
multimodal item `"{instruction} Query: {q} Candidate: {c}"` whose images are
query images followed by candidate images, batched to STATIC shapes by the
same processor adapters as the embedder; the scoring vector contracts the
last-token hidden state inside the jitted forward.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.modules.multimodal import normalize_multimodal_item
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.multimodal_reranker")

DEFAULT_INSTRUCTION = (
    "Given a search query, judge whether the candidate answers it."
)


class MultimodalReranker:
    """Scores (query, candidate) multimodal pairs with a VLM backbone and a
    yes/no binary head."""

    multimodal = True  # MMEB harness passes full items, not text projections

    def __init__(
        self,
        model,  # BiMultimodalEmbedderModel (any backbone_type)
        score_vector: np.ndarray,  # [hidden] = w_yes - w_no
        tokenizer=None,
        batch_size: int = 8,
        max_length: int = 256,
        media_root: Optional[str] = None,
        instruction: str = DEFAULT_INSTRUCTION,
        attention_impl: Optional[str] = None,
    ):
        if attention_impl is not None:
            # serve-time text-trunk attention override ('fused' megakernel)
            from nexus_tpu.inference.embedder.text_retrieval import _override_attention_impl

            _override_attention_impl(model, attention_impl)
        self.model = model
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.media_root = media_root
        self.instruction = instruction
        c = model.vlm_config
        if model.backbone_type in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5"):
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
            )
        else:
            from nexus_tpu.modules.multimodal import MultimodalProcessorAdapter

            self.processor = MultimodalProcessorAdapter(
                tokenizer, image_size=c.vision.image_size,
                num_image_tokens=c.num_image_tokens, max_length=max_length,
            )
        vec = jnp.asarray(np.asarray(score_vector, np.float32))

        def _score(variables, feed):
            out = model.net.apply(
                variables,
                input_ids=feed["input_ids"],
                attention_mask=feed["attention_mask"],
                pixel_patches=feed.get("pixel_patches"),
                positions3=feed.get("positions3"),
            ) if model.backbone_type in ("qwen2-vl", "qwen2.5-vl", "qwen3-vl", "qwen3.5") else model.net.apply(
                variables,
                input_ids=feed["input_ids"],
                attention_mask=feed["attention_mask"],
                pixel_values=feed.get("pixel_values"),
                image_slot_mask=feed.get("image_slot_mask"),
            )
            hidden = out["last_hidden_state"].astype(jnp.float32)  # [B, L, H]
            mask = feed["attention_mask"]
            last = jnp.maximum(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
            pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]
            return pooled @ vec  # [B] raw yes-minus-no logit

        self._score = jax.jit(_score)

    @classmethod
    def from_hf_pretrained(
        cls, model_dir: str, yes_token: str = "yes", no_token: str = "no",
        image_size: int = 224, **kw,
    ) -> "MultimodalReranker":
        """Build from a raw HF Qwen-VL-family checkpoint dir: converts the
        backbone weights and extracts the yes/no LM-head scoring vector."""
        import os

        from transformers import AutoTokenizer

        from nexus_tpu.models.hf_convert import qwen3vl_binary_score_vector
        from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
            BiMultimodalEmbedderModel,
        )

        model = BiMultimodalEmbedderModel.from_hf_pretrained(model_dir, image_size=image_size)
        tokenizer = kw.pop("tokenizer", None) or AutoTokenizer.from_pretrained(model_dir)
        yes_id = tokenizer.convert_tokens_to_ids(yes_token)
        no_id = tokenizer.convert_tokens_to_ids(no_token)

        from nexus_tpu.models.hf_convert import load_hf_state_dict

        sd = load_hf_state_dict(model_dir)
        vec = qwen3vl_binary_score_vector(sd, yes_id, no_id)
        return cls(model, vec, tokenizer=tokenizer, **kw)

    # -- scoring -------------------------------------------------------------

    def _pair_item(self, query, cand) -> dict:
        q = normalize_multimodal_item(query, self.media_root)
        c = normalize_multimodal_item(cand, self.media_root)
        return {
            "text": f"{self.instruction} Query: {q['text']} Candidate: {c['text']}",
            "images": q["images"] + c["images"],
            "videos": q["videos"] + c["videos"],
            "pages": q["pages"] + c["pages"],
        }

    def compute_score(
        self, pairs: Sequence[Tuple[Union[str, dict], Union[str, dict]]],
        normalize: bool = True,
    ) -> List[float]:
        single = isinstance(pairs, tuple) and len(pairs) == 2 and not isinstance(pairs[0], tuple)
        if single:
            pairs = [pairs]
        items = [self._pair_item(q, c) for q, c in pairs]
        scores: List[float] = []
        for off in range(0, len(items), self.batch_size):
            chunk = items[off : off + self.batch_size]
            n = len(chunk)
            if n < self.batch_size:
                chunk = chunk + [{"text": "", "images": [], "videos": [], "pages": []}] * (
                    self.batch_size - n
                )
            feed = self.processor(chunk)
            out = np.asarray(self._score(self.model.variables, feed))[:n]
            scores.extend(out.tolist())
        if normalize:
            scores = (1.0 / (1.0 + np.exp(-np.asarray(scores, np.float64)))).tolist()
        return scores[0] if single else scores
