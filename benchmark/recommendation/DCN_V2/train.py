"""DCNv2 ranker training (parity: /root/reference/benchmark/recommendation/
DCN_V2/train.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common import ensure_synthetic_dataset

from nexus_tpu.training.reranker.recommendation import DCNv2Ranker, RankerRunner


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    data_config = ensure_synthetic_dataset()
    runner = RankerRunner(
        model_config_or_path=os.path.join(here, "model_config.json"),
        data_config_or_path=data_config,
        train_config_or_path=os.path.join(here, "training_config.json"),
        model_class=DCNv2Ranker,
    )
    runner.run()


if __name__ == "__main__":
    main()
