import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import ensure_synthetic_dataset
from nexus_tpu.training.embedder.recommendation import DSSMInBatchRetriever, RetrieverRunner


def main():
    runner = RetrieverRunner(
        model_config_or_path={"embedding_dim": 16, "mlp_layers": [128, 64],
                              "dropout": 0.1, "batch_norm": False},
        data_config_or_path=ensure_synthetic_dataset(),
        train_config_or_path={"num_train_epochs": 1, "per_device_train_batch_size": 512,
                              "output_dir": "/tmp/nexus_bench_ckpt/dssm",
                              "metrics": ["ndcg", "recall"], "cutoffs": [10, 50],
                              "learning_rate": 0.01, "logging_steps": 10},
        model_class=DSSMInBatchRetriever,
    )
    runner.run()


if __name__ == "__main__":
    main()
