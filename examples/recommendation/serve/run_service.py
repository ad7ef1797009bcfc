"""Two-stage recommendation service over trained benchmark checkpoints
(parity: serve/inference_service.py). Train MLP_Retriever and MLP_Ranker
benchmarks first, then run this and POST to /recommend."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..",
                                "benchmark", "recommendation"))
import numpy as np
from common import ensure_synthetic_dataset
from nexus_tpu.data.dataset import ItemDataset, ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore
from nexus_tpu.inference.index import ItemIndex
from nexus_tpu.inference.reranker.recommendation import BaseRerankerInferenceEngine
from nexus_tpu.serve import InferenceService

RETRIEVER = "/tmp/nexus_bench_ckpt/mlp_retriever"
RANKER = "/tmp/nexus_bench_ckpt/mlp_ranker"


def main():
    data_config = ensure_synthetic_dataset()
    train_cfg, _ = ConfigProcessor(data_config).split_config()
    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    for batch in ShardedDataset(train_cfg, batch_size=512, drop_last=False):
        nv = int(batch.pop("_nvalid", len(batch["user_id"])))
        for i in range(nv):
            row = {f: int(batch[f][i]) for f in train_cfg.context_features}
            for sn in ["seq_effective"]:
                for f, mat in batch[sn].items():
                    row[f"{sn}.{f}"] = [int(x) for x in mat[i]]
            kv.set(f"user:{row['user_id']}", cache.codec.encode(row))
    items = ItemDataset(train_cfg)
    table = items.item_feature_table()
    for iid in range(items.num_items):
        kv.set(f"item:{iid}", cache.codec.encode({f: int(table[f][iid]) for f in table}))

    iv = np.load(os.path.join(RETRIEVER, "item_vectors.npy"))
    index = ItemIndex.build(iv, index_type="ivf", nlist=100, nprobe=10)
    retriever = BaseEmbedderInferenceEngine(
        {"model_ckpt_path": RETRIEVER, "retrieve_mode": "u2i", "output_topk": 50},
        kv_store=kv, item_index=index,
    )
    ranker = BaseRerankerInferenceEngine(
        {"model_ckpt_path": RANKER, "output_topk": 10}, kv_store=kv,
    )
    svc = InferenceService(retriever, ranker, port=int(os.environ.get("PORT", 8080)))
    print(f"POST http://127.0.0.1:{svc.port}/recommend  {{\"user_ids\": [...]}}")
    svc.start(block=True)


if __name__ == "__main__":
    main()
