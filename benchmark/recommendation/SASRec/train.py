import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import ensure_synthetic_dataset
from nexus_tpu.training.embedder.recommendation import RetrieverRunner, SASRecRetriever


def main():
    runner = RetrieverRunner(
        model_config_or_path={"embedding_dim": 16, "mlp_layers": [64], "num_neg": 20,
                              "n_layers": 2, "n_heads": 4, "hidden_size": 128,
                              "dropout": 0.1, "batch_norm": False},
        data_config_or_path=ensure_synthetic_dataset(),
        train_config_or_path={"num_train_epochs": 1, "per_device_train_batch_size": 256,
                              "output_dir": "/tmp/nexus_bench_ckpt/sasrec",
                              "metrics": ["ndcg", "recall"], "cutoffs": [10, 50],
                              "learning_rate": 0.001, "logging_steps": 10},
        model_class=SASRecRetriever,
    )
    runner.run()


if __name__ == "__main__":
    main()
