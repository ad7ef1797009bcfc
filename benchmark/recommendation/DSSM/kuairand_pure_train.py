"""DSSM retriever on the KuaiRand-Pure config shape (parity: benchmark/
recommendation/DSSM/kuairand_pure_train.py) — pure context+item features,
no user-sequence side tables."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))

from common import DATA_ROOT, FAST
from nexus_tpu.training.embedder.recommendation import DSSMInBatchRetriever, RetrieverRunner


def ensure_kuairand_dataset() -> str:
    root = DATA_ROOT + "_kuairand"
    cfg = os.path.join(root, "data_config.json")
    if not os.path.exists(cfg):
        from nexus_tpu.data.synthetic import generate_synthetic_kuairand

        kw = dict(n_days=2, rows_per_day=512) if FAST else {}
        cfg = generate_synthetic_kuairand(root, **kw)
    return cfg


def main():
    with open(os.path.join(HERE, "model_config.json")) as f:
        model_cfg = json.load(f)
    train_cfg = {
        "num_train_epochs": 1, "per_device_train_batch_size": 256,
        "output_dir": "/tmp/nexus_bench_ckpt/dssm_kuairand",
        "learning_rate": 0.01, "logging_steps": 10,
        "metrics": ["ndcg", "recall"], "cutoffs": [10, 50],
    }
    runner = RetrieverRunner(
        model_config_or_path=model_cfg,
        data_config_or_path=ensure_kuairand_dataset(),
        train_config_or_path=train_cfg,
        model_class=DSSMInBatchRetriever,
    )
    runner.run()


if __name__ == "__main__":
    main()
