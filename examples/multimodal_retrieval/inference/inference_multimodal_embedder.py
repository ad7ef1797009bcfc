"""Multimodal embedder inference demo (parity: examples/multimodal_retrieval/
inference/inference_multimodal_embedder.py — encode_queries / encode_corpus
over text+image items, cosine ranking).

Runs fully offline by default: trains the tiny smoke VLM on the bundled
color-square dataset first (examples/multimodal_retrieval/train_smoke.py),
then retrieves — so the ranking is real, not random. Pass a trained
checkpoint dir via MODEL_NAME_OR_PATH to use a real model instead.

    python inference_multimodal_embedder.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))
sys.path.insert(0, os.path.join(HERE, ".."))

import numpy as np


def main():
    from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder

    ckpt = os.getenv("MODEL_NAME_OR_PATH")
    if ckpt:
        embedder = MultimodalEmbedder(
            model_name_or_path=ckpt, batch_size=4, max_length=48,
            media_root=os.path.join(HERE, "..", "data"),
        )
    else:
        import train_smoke  # the bundled tiny VLM + color-square data

        model, tokenizer = train_smoke.main()
        embedder = MultimodalEmbedder(
            model=model, tokenizer=tokenizer, batch_size=4, max_length=48,
            media_root=os.path.join(HERE, "..", "data"),
        )

    queries = [
        {"text": "a red colored square"},
        {"text": "a blue colored square"},
    ]
    corpus = [
        {"text": "image", "images": ["images/red.png"]},
        {"text": "image", "images": ["images/green.png"]},
        {"text": "image", "images": ["images/blue.png"]},
    ]
    q = embedder.encode_queries(queries)
    d = embedder.encode_corpus(corpus)
    sims = q @ d.T
    print("similarity matrix (queries x corpus):")
    print(np.round(sims, 3))
    names = ["red", "green", "blue"]
    for i, query in enumerate(queries):
        best = int(np.argmax(sims[i]))
        print(f"  {query['text']!r} -> {names[best]}.png")
    if not ckpt:  # the smoke-trained model must solve the toy task
        assert int(np.argmax(sims[0])) == 0 and int(np.argmax(sims[1])) == 2


if __name__ == "__main__":
    main()
