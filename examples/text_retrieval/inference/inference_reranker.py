"""Reranker inference modes demo (parity: examples/text_retrieval/inference/
reranker/inference_reranker.py — normal / onnx / tensorrt becomes
normal-jit / AOT-bucketed / serialized-StableHLO).

Runs fully offline against a tiny local cross-encoder checkpoint unless you
pass a real one (BERT-head or decoder yes-logit rerankers both load through
the same engine). Usage:

    python inference_reranker.py [model_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np


def build_tiny_checkpoint(d: str) -> str:
    from transformers import BertConfig, BertForSequenceClassification, BertTokenizerFast

    os.makedirs(d, exist_ok=True)
    words = ["hello", "what", "is", "your", "name", "dog", "cat", "runs"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt")).save_pretrained(d)
    BertForSequenceClassification(
        BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=64, num_labels=1)
    ).save_pretrained(d)
    return d


def main():
    from nexus_tpu.inference.reranker.text_retrieval import BaseRerankerInferenceEngine

    model_path = sys.argv[1] if len(sys.argv) > 1 else build_tiny_checkpoint(
        os.path.join(tempfile.mkdtemp(prefix="nx_rerank_"), "tiny_ce")
    )
    qa_pairs = [("hello what is your name", "your name is hello"),
                ("dog runs", "cat runs")]

    # 1. normal: jit per observed shape bucket
    engine = BaseRerankerInferenceEngine(model_name_or_path=model_path,
                                         infer_mode="normal", batch_size=32)
    s_normal = np.asarray(engine.inference(qa_pairs, normalize=False))
    print("normal    :", s_normal)

    # 2. aot: bucketed executables compiled up front
    engine_aot = BaseRerankerInferenceEngine(model_name_or_path=model_path,
                                             infer_mode="aot", batch_size=32)
    s_aot = np.asarray(engine_aot.inference(qa_pairs, normalize=False))
    print("aot       :", s_aot)
    assert np.allclose(s_normal, s_aot, atol=1e-5)

    # 3. serialized StableHLO round-trip (the .onnx-file analog)
    out_path = os.path.join(os.path.dirname(model_path), "reranker.stablehlo")
    engine_aot.convert_to_serialized(out_path)
    print("serialized ->", out_path)

    # 4. packed scoring: many pairs per row (block-diagonal segment
    # attention — identical scores, no pad FLOPs at realistic pair lengths)
    engine_packed = BaseRerankerInferenceEngine(
        model_name_or_path=model_path, infer_mode="normal", batch_size=32,
        packing=True)
    s_packed = np.asarray(engine_packed.inference(qa_pairs, normalize=False))
    print("packed    :", s_packed)
    assert np.allclose(s_normal, s_packed, atol=1e-4)

    # on a real checkpoint also consider attention_impl='fused' (the
    # decoder/encoder megakernels) — a serve-time override, no config edits:
    #   BaseRerankerInferenceEngine(model_name_or_path=..., packing=True,
    #                               attention_impl="fused")

    # normalized scores (sigmoid), like the reference's normalize=True
    print("normalized:", np.asarray(engine.inference(qa_pairs, normalize=True)))


if __name__ == "__main__":
    main()
