"""TDE DCNv2 ranker serving (parity: benchmark/recommendation/DCN_V2/
tde_infer.py): hydrate users + candidates, transform unbounded ids through
the restored transformer, score with the compiled ranker."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from common import _populate_feature_store, ensure_synthetic_dataset
from nexus_tpu.data.dataset import ItemDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.inference.tde_engine import TDERerankerInferenceEngine

CKPT = "/tmp/nexus_bench_ckpt/tde_dcn_v2"

if __name__ == "__main__":
    data_config = ensure_synthetic_dataset()
    kv, cfg = _populate_feature_store(data_config)
    engine = TDERerankerInferenceEngine(
        {"model_ckpt_path": CKPT, "output_topk": 5,
         "tde_features": {"video_id": 2000}},
        kv_store=kv,
    )
    users = [int(k.split(b":" if isinstance(k, bytes) else ":")[1])
             for k in kv.keys("user:*")[:8]]
    rng = np.random.default_rng(0)
    table = ItemDataset(ConfigProcessor(data_config).split_config()[0]).item_feature_table()
    attr = cfg.to_attr()
    cand_ids = rng.integers(1, attr.num_items, (len(users), 20))
    candidates = {f: table[f][cand_ids] for f in attr.item_features}
    out = engine.batch_inference(users, candidates)
    print("ranked candidates for first user:", out["item_ids"][0].tolist())
