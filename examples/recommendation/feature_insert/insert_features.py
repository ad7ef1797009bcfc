"""Populate the feature store from the synthetic dataset (parity:
examples/recommendation/inference/feature_insert + insert_redis.py).
Set FEATURE_STORE=redis://host:port to target a real Redis."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..",
                                "benchmark", "recommendation"))
from common import ensure_synthetic_dataset
from nexus_tpu.data.dataset import ItemDataset, ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.inference.feature_store import FeatureCache, get_kv_store


def main():
    cfg = ensure_synthetic_dataset()
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    url = os.environ.get("FEATURE_STORE")
    kv = get_kv_store({"backend": "redis", "url": url} if url else None)
    cache = FeatureCache(kv)
    n_users = 0
    for batch in ShardedDataset(train_cfg, batch_size=512, drop_last=False):
        nv = int(batch.pop("_nvalid", len(batch["user_id"])))
        for i in range(nv):
            row = {f: int(batch[f][i]) for f in train_cfg.context_features}
            for sn in ["seq_effective"]:
                for f, mat in batch[sn].items():
                    row[f"{sn}.{f}"] = [int(x) for x in mat[i]]
            kv.set(f"user:{row['user_id']}", cache.codec.encode(row))
            n_users += 1
    items = ItemDataset(train_cfg)
    table = items.item_feature_table()
    for iid in range(items.num_items):
        kv.set(f"item:{iid}", cache.codec.encode({f: int(table[f][iid]) for f in table}))
    print(f"inserted {n_users} user rows + {items.num_items} item rows")


if __name__ == "__main__":
    main()
