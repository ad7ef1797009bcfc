"""TDE u2i serving round-trip from the tde_train checkpoint (parity:
benchmark/recommendation/DCN_V2/tde_infer.py): raw unbounded ids hydrate
-> id->slot transform (state + PS rows restored) -> encode -> index search."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from common import _populate_feature_store, ensure_synthetic_dataset
from nexus_tpu.inference.index import ItemIndex
from nexus_tpu.inference.tde_engine import TDEEmbedderInferenceEngine

CKPT = "/tmp/nexus_bench_ckpt/tde_retriever"

if __name__ == "__main__":
    data_config = ensure_synthetic_dataset()
    kv, _ = _populate_feature_store(data_config)
    iv = np.load(os.path.join(CKPT, "item_vectors.npy"))
    index = ItemIndex.build(iv, index_type="ivf", nlist=min(100, len(iv)), nprobe=10)
    engine = TDEEmbedderInferenceEngine(
        {"model_ckpt_path": CKPT, "retrieve_mode": "u2i", "output_topk": 10,
         "tde_features": {"video_id": 2000}},
        kv_store=kv, item_index=index,
    )
    users = [int(k.split(b":" if isinstance(k, bytes) else ":")[1]) for k in kv.keys("user:*")[:16]]
    out = engine.batch_inference(users)
    print("topk items for first user:", out["item_ids"][0].tolist())
    print("stage timers:", {k: round(v, 4) for k, v in engine.timers.items()})
