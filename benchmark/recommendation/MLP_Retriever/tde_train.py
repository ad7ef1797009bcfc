"""Dynamic-embedding (TDE) retriever training
(parity: benchmark .../tde_train.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import ensure_synthetic_dataset
from nexus_tpu.dynamic_embedding.runner import TDERetrieverRunner
from nexus_tpu.training.embedder.recommendation import MLPRetriever


def main():
    runner = TDERetrieverRunner(
        {"embedding_dim": 16, "mlp_layers": [128, 64], "num_neg": 20,
         "dropout": 0.1, "batch_norm": False},
        ensure_synthetic_dataset(),
        {"num_train_epochs": 1, "per_device_train_batch_size": 512,
         "output_dir": "/tmp/nexus_bench_ckpt/tde_retriever",
         "learning_rate": 0.01, "logging_steps": 10, "evaluation_strategy": "no"},
        model_class=MLPRetriever,
        tde_features={"video_id": 2000},
    )
    runner.run()
    print("id transformer stats:", runner.tde.transformer_group.stats)


if __name__ == "__main__":
    main()
