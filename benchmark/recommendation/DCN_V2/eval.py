"""DCNv2 ranker evaluation (parity: benchmark .../eval.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common import ensure_synthetic_dataset

from nexus_tpu.evaluation.recommendation.evaluator import RecommenderEvalRunner


def main():
    data_config = ensure_synthetic_dataset()
    runner = RecommenderEvalRunner(
        data_config, ranker_ckpt_path="/tmp/nexus_bench_ckpt/dcn_v2",
        metrics=["auc", "logloss"],
    )
    print(runner.run())


if __name__ == "__main__":
    main()
