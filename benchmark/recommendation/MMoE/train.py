import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import ensure_synthetic_dataset
from nexus_tpu.training.reranker.recommendation import MMoERanker, RankerRunner


def main():
    # multi-task synthetic dataset (two labels)
    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    root = "/tmp/nexus_bench_data_multi"
    cfg = os.path.join(root, "data_config.json")
    if not os.path.exists(cfg):
        cfg = generate_synthetic_recflow(root, n_days=4, rows_per_day=8192, seq_len=20,
                                         labels=("effective_view", "long_view"))
    runner = RankerRunner(
        model_config_or_path={"embedding_dim": 16, "mlp_layers": [128, 64], "n_experts": 3,
                              "gate_layers": [32], "tower_layers": [32], "dropout": 0.1,
                              "batch_norm": False},
        data_config_or_path=cfg,
        train_config_or_path={"num_train_epochs": 1, "per_device_train_batch_size": 1024,
                              "output_dir": "/tmp/nexus_bench_ckpt/mmoe",
                              "metrics": ["auc", "logloss"], "learning_rate": 0.01,
                              "logging_steps": 10},
        model_class=MMoERanker,
    )
    runner.run()


if __name__ == "__main__":
    main()
