"""i2i retrieval demo (parity: examples/recommendation/inference/test/
i2i_index_demo.py): precompute per-item neighbor lists into the KV store
with gen_i2i_index, then serve i2i recommendations off the user's recent
behavior triggers (configurable trigger count + fusion).

Reuses the MLP_Retriever benchmark checkpoint (trains it first if missing).

    NEXUS_BENCH_FAST=1 python i2i_index_demo.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))
sys.path.insert(0, os.path.join(HERE, "..", "..", "..", "benchmark", "recommendation"))

import numpy as np

CKPT = "/tmp/nexus_bench_ckpt/mlp_retriever"


def main():
    if not os.path.exists(os.path.join(CKPT, "model_config.json")):
        print("training MLP_Retriever checkpoint...")
        subprocess.run(
            [sys.executable, os.path.join(HERE, "..", "..", "..", "benchmark",
                                          "recommendation", "MLP_Retriever", "train.py")],
            check=True,
            env={**os.environ, "NEXUS_BENCH_FAST": os.environ.get("NEXUS_BENCH_FAST", "1")},
        )

    from common import _populate_feature_store, ensure_synthetic_dataset
    from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
    from nexus_tpu.inference.index import gen_i2i_index

    data_config = ensure_synthetic_dataset()
    kv, _ = _populate_feature_store(data_config)

    item_vectors = np.load(os.path.join(CKPT, "item_vectors.npy"))
    gen_i2i_index(item_vectors, kv, topk=10)  # i2i:{item} -> neighbor list
    print(f"i2i neighbor lists written for {len(item_vectors)} items")

    engine = BaseEmbedderInferenceEngine(
        {"model_ckpt_path": CKPT, "retrieve_mode": "i2i", "output_topk": 8,
         "i2i_num_triggers": 3, "i2i_fusion": "interleave"},
        kv_store=kv,
    )
    users = [int(k.split(b":" if isinstance(k, bytes) else ":")[1])
             for k in kv.keys("user:*")[:8]]
    out = engine.batch_inference(users)
    print("i2i recommendations for first user:", out["item_ids"][0].tolist())


if __name__ == "__main__":
    main()
