"""Serving-path demo: build the item index from the trained checkpoint,
populate the in-process feature store, run the u2i engine
(parity: benchmark .../infer.py + insert_redis.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from common import ensure_synthetic_dataset
from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore
from nexus_tpu.inference.index import ItemIndex

CKPT = "/tmp/nexus_bench_ckpt/mlp_retriever"


def main():
    data_config = ensure_synthetic_dataset()
    train_cfg, _ = ConfigProcessor(data_config).split_config()
    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    ds = ShardedDataset(train_cfg, batch_size=512, drop_last=False)
    inserted = 0
    for batch in ds:
        nv = int(batch.pop("_nvalid", len(batch["user_id"])))
        for i in range(nv):
            row = {f: int(batch[f][i]) for f in train_cfg.context_features}
            for sn in ["seq_effective"]:
                for f, mat in batch[sn].items():
                    row[f"{sn}.{f}"] = [int(x) for x in mat[i]]
            kv.set(f"user:{row['user_id']}", cache.codec.encode(row))
            inserted += 1
    print(f"feature store populated: {inserted} rows")

    iv = np.load(os.path.join(CKPT, "item_vectors.npy"))
    index = ItemIndex.build(iv, index_type="ivf", nlist=100, nprobe=10)
    engine = BaseEmbedderInferenceEngine(
        {"model_ckpt_path": CKPT, "retrieve_mode": "u2i", "output_topk": 10},
        kv_store=kv, item_index=index,
    )
    users = [int(k.split(":")[1]) for k in kv.keys("user:*")[:16]]
    out = engine.batch_inference(users)
    print("topk items for first user:", out["item_ids"][0].tolist())
    print("stage timers:", {k: round(v, 4) for k, v in engine.timers.items()})


if __name__ == "__main__":
    main()
