import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import ensure_synthetic_dataset
from model import DINRanker

from nexus_tpu.training.reranker.recommendation import RankerRunner


def main():
    data_config = ensure_synthetic_dataset()
    runner = RankerRunner(
        model_config_or_path={
            "embedding_dim": 16, "mlp_layers": [128, 64], "din_hidden_size": 36,
            "dropout": 0.1, "batch_norm": False,
        },
        data_config_or_path=data_config,
        train_config_or_path={
            "num_train_epochs": 1, "per_device_train_batch_size": 1024,
            "output_dir": "/tmp/nexus_bench_ckpt/din", "metrics": ["auc", "logloss"],
            "learning_rate": 0.01, "logging_steps": 10,
        },
        model_class=DINRanker,
    )
    runner.run()


if __name__ == "__main__":
    main()
