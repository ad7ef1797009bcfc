"""Text reranker fine-tuning entry (parity: examples/text_retrieval/training/
reranker run scripts in the reference, incl. the logs behind BASELINE.md's
39.7 samples/s single-device number).

Point --model_dir at a local HF checkpoint:
- a BERT-family dir (bge-reranker-*) -> BERT-head cross-encoder;
- a Llama/Qwen-class dir -> decoder (LLM) yes-logit cross-encoder; add
  --lora_rank 16 for adapter fine-tuning.
--train_data takes BGE-format jsonl (query / pos / neg [/ *_scores for KD]).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.text_retrieval import TextRerankerRunner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--output_dir", default="/tmp/nexus_text_reranker")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--group_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=6e-5)
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--kd", action="store_true")
    ap.add_argument("--lora_rank", type=int, default=0)
    ap.add_argument("--pack_pairs", action="store_true",
                    help="pack ragged pairs into dense rows (BERT backbones)")
    args = ap.parse_args()

    runner = TextRerankerRunner(
        args.model_dir,
        args.train_data,
        TrainingArguments.from_dict({
            "output_dir": args.output_dir, "num_train_epochs": args.epochs,
            "per_device_train_batch_size": args.batch_size, "learning_rate": args.lr,
            "optimizer": "adamw", "logging_steps": 20, "evaluation_strategy": "no",
        }),
        train_group_size=args.group_size,
        max_len=args.max_len,
        knowledge_distillation=args.kd,
        lora_rank=args.lora_rank,
        pack_pairs=args.pack_pairs,
    )
    runner.run()


if __name__ == "__main__":
    main()
