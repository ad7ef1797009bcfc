"""Offline eval of the KuaiRand-Pure DSSM checkpoint (parity: benchmark/
recommendation/DSSM/kuairand_pure_eval.py)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kuairand_pure_train import ensure_kuairand_dataset
from nexus_tpu.evaluation.recommendation.evaluator import RecommenderEvalRunner

if __name__ == "__main__":
    runner = RecommenderEvalRunner(
        ensure_kuairand_dataset(),
        retriever_ckpt_path="/tmp/nexus_bench_ckpt/dssm_kuairand",
        metrics=["ndcg", "recall"], cutoffs=[10, 50],
    )
    out = runner.run()
    print(json.dumps(out, default=lambda x: round(float(x), 5)))
