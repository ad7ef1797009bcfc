"""Full offline->online round-trip in one command (parity: the reference's
feature_insert pipeline + inference_service demo):

train retriever + ranker (if missing) -> populate the feature store ->
build the IVF item index -> start the two-stage HTTP cascade -> query it.
"""
import json
import os
import subprocess
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "benchmark", "recommendation"))

BENCH = os.path.join(os.path.dirname(__file__), "..", "..", "benchmark", "recommendation")


def ensure_checkpoints():
    for name, dir_ in (("mlp_retriever", "MLP_Retriever"), ("mlp_ranker", "MLP_Ranker")):
        if not os.path.exists(f"/tmp/nexus_bench_ckpt/{name}/model_config.json"):
            print(f"training {name}...")
            subprocess.run([sys.executable, os.path.join(BENCH, dir_, "train.py")],
                           check=True, env={**os.environ, "NEXUS_BENCH_FAST":
                                            os.environ.get("NEXUS_BENCH_FAST", "1")})


def main():
    ensure_checkpoints()
    import numpy as np

    from common import ensure_synthetic_dataset
    from nexus_tpu.data.dataset import ItemDataset, ShardedDataset
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
    from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore
    from nexus_tpu.inference.index import ItemIndex
    from nexus_tpu.inference.reranker.recommendation import BaseRerankerInferenceEngine
    from nexus_tpu.serve import InferenceService

    data_config = ensure_synthetic_dataset()
    train_cfg, _ = ConfigProcessor(data_config).split_config()
    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    users = set()
    for batch in ShardedDataset(train_cfg, batch_size=512, drop_last=False):
        nv = int(batch.pop("_nvalid", len(batch["user_id"])))
        seq_names = [k for k, v in batch.items() if isinstance(v, dict)]
        for i in range(nv):
            row = {f: int(batch[f][i]) for f in train_cfg.context_features}
            for sn in seq_names:
                for f, mat in batch[sn].items():
                    row[f"{sn}.{f}"] = [int(x) for x in mat[i]]
            kv.set(f"user:{row['user_id']}", cache.codec.encode(row))
            users.add(row["user_id"])
    items = ItemDataset(train_cfg)
    table = items.item_feature_table()
    for iid in range(items.num_items):
        kv.set(f"item:{iid}", cache.codec.encode({f: int(table[f][iid]) for f in table}))
    print(f"feature store: {len(users)} users, {items.num_items} items")

    iv = np.load("/tmp/nexus_bench_ckpt/mlp_retriever/item_vectors.npy")
    index = ItemIndex.build(iv, index_type="ivf", nlist=min(100, len(iv)), nprobe=10)
    retriever = BaseEmbedderInferenceEngine(
        {"model_ckpt_path": "/tmp/nexus_bench_ckpt/mlp_retriever",
         "retrieve_mode": "u2i", "output_topk": 50},
        kv_store=kv, item_index=index,
    )
    ranker = BaseRerankerInferenceEngine(
        {"model_ckpt_path": "/tmp/nexus_bench_ckpt/mlp_ranker", "output_topk": 10},
        kv_store=kv,
    )
    svc = InferenceService(retriever, ranker, port=0).start()
    try:
        payload = json.dumps({"user_ids": sorted(users)[:4]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{svc.port}/recommend", payload,
            headers={"Content-Type": "application/json"},
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
        print("cascade response:", json.dumps(resp)[:400])
        assert resp["ranked"] and len(resp["ranked"][0]) == 10
        print("ROUND TRIP OK")
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
