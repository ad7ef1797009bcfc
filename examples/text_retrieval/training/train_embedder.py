"""Text embedder fine-tuning entry (parity: examples/text_retrieval/training/
embedder run scripts). Point --model_dir at a local BGE/BERT HF checkpoint and
--train_data at BGE-format jsonl."""
import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.text_retrieval import (
    TextEmbedderDataArguments, TextEmbedderModelArguments, TextEmbedderRunner,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--output_dir", default="/tmp/nexus_text_embedder")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--group_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--kd", action="store_true")
    args = ap.parse_args()

    runner = TextEmbedderRunner(
        TextEmbedderModelArguments(model_name_or_path=args.model_dir, temperature=0.02),
        TextEmbedderDataArguments(
            train_data=args.train_data, train_group_size=args.group_size,
            query_max_len=args.max_len, passage_max_len=args.max_len,
            knowledge_distillation=args.kd,
        ),
        TrainingArguments.from_dict({
            "output_dir": args.output_dir, "num_train_epochs": args.epochs,
            "per_device_train_batch_size": args.batch_size, "learning_rate": args.lr,
            "optimizer": "adamw", "logging_steps": 20, "evaluation_strategy": "no",
        }),
    )
    runner.run()


if __name__ == "__main__":
    main()
