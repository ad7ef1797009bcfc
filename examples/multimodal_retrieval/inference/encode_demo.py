"""Chat-template multimodal encode demo (parity: examples/multimodal_retrieval/
inference/encode_demo.py — the Qwen-VL chat-template + last-token pooling
encode path, retrieve over text+image corpus).

Offline by default: builds a TINY random Qwen2-VL HF checkpoint on the fly
(weights are untrained, so only the engine plumbing — HF conversion, the
chat-template processor, patch extraction, jit encode — is demonstrated,
not retrieval quality). Point MODEL_NAME_OR_PATH at a real Qwen2-VL /
Qwen2.5-VL / Qwen3-VL checkpoint dir to get meaningful embeddings through
the exact same code.

    python encode_demo.py
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))

import numpy as np


def build_tiny_qwen2vl_checkpoint() -> str:
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, num_heads=2, in_channels=3, patch_size=4,
            temporal_patch_size=2, spatial_merge_size=2, mlp_ratio=2.0,
            hidden_size=48, hidden_act="quick_gelu",
        ),
        text_config=dict(
            vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rope_theta=10000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        image_token_id=7, video_token_id=8, vision_start_token_id=9,
    )
    torch.manual_seed(0)
    d = tempfile.mkdtemp(prefix="nx_qwen2vl_demo_")
    Qwen2VLForConditionalGeneration(cfg).eval().save_pretrained(d)
    return d


class ByteTokenizer:
    """Self-contained stand-in for the HF tokenizer (offline demo only)."""

    pad_token_id = 0

    def __call__(self, text, **kw):
        toks = [10 + (ord(ch) % 200) for ch in text]
        return {"input_ids": toks[: kw.get("max_length", 64)]}


def main():
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder

    ckpt = os.getenv("MODEL_NAME_OR_PATH")
    if ckpt:
        embedder = MultimodalEmbedder(
            model_name_or_path=ckpt, batch_size=2, max_length=256,
            media_root=os.path.join(HERE, "..", "data"),
            use_chat_template=True,
        )
    else:
        from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
            BiMultimodalEmbedderModel,
        )

        model = BiMultimodalEmbedderModel.from_hf_pretrained(
            build_tiny_qwen2vl_checkpoint(), image_size=16
        )
        embedder = MultimodalEmbedder(
            model=model, tokenizer=ByteTokenizer(), batch_size=2, max_length=64,
            media_root=os.path.join(HERE, "..", "data"),
            use_chat_template=True,
        )

    queries = [{"text": "Find the matching color square."}]
    corpus = [
        {"text": "The red square.", "images": ["images/red.png"]},
        {"text": "The blue square.", "images": ["images/blue.png"]},
    ]
    q = embedder.encode_queries(queries)
    d = embedder.encode_corpus(corpus)
    sims = np.atleast_2d(q) @ np.atleast_2d(d).T
    print("embeddings:", np.shape(q), np.shape(d), "similarities:", np.round(sims, 4))
    assert np.isfinite(sims).all()


if __name__ == "__main__":
    main()
