"""Standalone TDE DCNv2 ranker eval (parity: benchmark/recommendation/
DCN_V2/tde_eval.py -> TDERecommenderEvalRunner)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common import ensure_synthetic_dataset
from nexus_tpu.evaluation.recommendation import TDERecommenderEvalRunner
from nexus_tpu.inference.feature_store import MemoryKVStore

CKPT = "/tmp/nexus_bench_ckpt/tde_dcn_v2"

if __name__ == "__main__":
    ps_path = os.path.join(CKPT, "tde_ps.pkl")
    ps = MemoryKVStore.load(ps_path) if os.path.exists(ps_path) else None
    runner = TDERecommenderEvalRunner(
        ensure_synthetic_dataset(),
        tde_features={"video_id": 2000},
        ps=ps,
        ranker_ckpt_path=CKPT,
        metrics=["auc", "logloss"],
    )
    out = runner.run()
    print(json.dumps(out, default=lambda x: round(float(x), 5)))
