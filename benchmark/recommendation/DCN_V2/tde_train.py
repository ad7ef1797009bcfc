"""Dynamic-embedding (TDE) DCNv2 ranker training (parity: benchmark/
recommendation/DCN_V2/tde_train.py — TDERankerRunner)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))

from common import ensure_synthetic_dataset
from nexus_tpu.dynamic_embedding.runner import TDERankerRunner
from nexus_tpu.training.reranker.recommendation import DCNv2Ranker


def main():
    with open(os.path.join(HERE, "model_config.json")) as f:
        model_cfg = json.load(f)
    runner = TDERankerRunner(
        model_cfg,
        ensure_synthetic_dataset(),
        {"num_train_epochs": 1, "per_device_train_batch_size": 512,
         "output_dir": "/tmp/nexus_bench_ckpt/tde_dcn_v2",
         "metrics": ["auc", "logloss"], "learning_rate": 0.01, "logging_steps": 10,
         "evaluation_strategy": "no"},
        model_class=DCNv2Ranker,
        tde_features={"video_id": 2000},
    )
    runner.run()
    print("id transformer stats:", runner.tde.transformer_group.stats)


if __name__ == "__main__":
    main()
