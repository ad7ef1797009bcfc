"""Embedder inference modes demo (parity: examples/text_retrieval/inference/
embedder/inference_embedder.py — its normal / onnx / tensorrt walk becomes
normal-jit / AOT-bucketed / serialized-StableHLO, the TPU engine's three
modes).

Runs fully offline: builds a tiny local BERT checkpoint unless you pass a
real one. Usage:

    python inference_embedder.py [model_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np


def build_tiny_checkpoint(d: str) -> str:
    from transformers import BertConfig, BertModel, BertTokenizerFast

    os.makedirs(d, exist_ok=True)
    words = ["hello", "what", "is", "your", "name", "dog", "cat", "runs"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt")).save_pretrained(d)
    BertModel(BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)).save_pretrained(d)
    return d


def main():
    from nexus_tpu.inference.embedder.text_retrieval import BaseEmbedderInferenceEngine

    model_path = sys.argv[1] if len(sys.argv) > 1 else build_tiny_checkpoint(
        os.path.join(tempfile.mkdtemp(prefix="nx_infer_"), "tiny_bert")
    )
    sentences = ["hello what is your name", "hello your name is what"]

    # 1. normal: jit per observed (batch, bucketed-length) shape
    engine = BaseEmbedderInferenceEngine(model_name_or_path=model_path,
                                         infer_mode="normal", batch_size=32)
    emb_normal = np.asarray(engine.inference(sentences, normalize=True))
    print("normal   sim:", float(emb_normal[0] @ emb_normal[1].T))

    # 2. aot: every (batch, bucket) executable compiled ahead of time —
    #    the TensorRT-engine analog (no first-request compile stall)
    engine_aot = BaseEmbedderInferenceEngine(model_name_or_path=model_path,
                                             infer_mode="aot", batch_size=32)
    emb_aot = np.asarray(engine_aot.inference(sentences, normalize=True))
    print("aot      sim:", float(emb_aot[0] @ emb_aot[1].T))
    assert np.allclose(emb_normal, emb_aot, atol=1e-5), "mode outputs must match"

    # 3. serialized: export the AOT executables as StableHLO bytes (the
    #    .onnx-file analog) and run them back through a bare session
    out_path = os.path.join(os.path.dirname(model_path), "embedder.stablehlo")
    engine_aot.convert_to_serialized(out_path)
    session = BaseEmbedderInferenceEngine.load_serialized(out_path)
    enc = engine_aot.tokenizer(sentences, padding=True, truncation=True,
                               max_length=engine_aot.max_length, return_tensors="np")
    emb_ser = session.run(None, {"input_ids": enc["input_ids"],
                                 "attention_mask": enc["attention_mask"]})[0]
    print("serialized sim:", float(emb_ser[0] @ emb_ser[1].T))
    assert np.allclose(emb_aot, emb_ser, atol=1e-5)

    # throughput sketch (real numbers: bench.py / bench_serving.py)
    batch = sentences * 256
    t0 = time.time()
    engine.inference(batch, normalize=True)
    print(f"normal mode: {len(batch) / (time.time() - t0):.0f} sentences/s")


if __name__ == "__main__":
    main()
