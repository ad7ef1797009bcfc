"""Text-reranker training CLI (parity: Nexus/training/reranker/
text_retrieval/__main__.py's HfArgumentParser entry). The backbone —
BERT-head cross-encoder or decoder (LLM) yes-logit cross-encoder — is
chosen by the checkpoint's config.json model_type.

    python -m nexus_tpu.training.reranker.text_retrieval \
        --model_name_or_path /path/to/bge-reranker --train_data a.jsonl \
        --output_dir ./out --num_train_epochs 1 ...

LLM reranker (any Llama/Qwen-class checkpoint dir):

    python -m nexus_tpu.training.reranker.text_retrieval \
        --model_name_or_path /path/to/llama --lora_rank 16 --train_data ...
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name_or_path", required=True)
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--train_group_size", type=int, default=8)
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--knowledge_distillation", action="store_true")
    ap.add_argument("--lora_rank", type=int, default=0,
                    help="LoRA adapters on a decoder backbone (0 = full fine-tune)")
    ap.add_argument("--lora_alpha", type=float, default=16.0)
    ap.add_argument("--output_dir", default="./saves/text_reranker")
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--per_device_train_batch_size", type=int, default=16)
    ap.add_argument("--learning_rate", type=float, default=6e-5)
    ap.add_argument("--warmup_steps", type=int, default=0)
    ap.add_argument("--logging_steps", type=int, default=20)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume_from_checkpoint", default=None)
    args = ap.parse_args()

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.reranker.text_retrieval import TextRerankerRunner

    runner = TextRerankerRunner(
        args.model_name_or_path,
        args.train_data,
        TrainingArguments.from_dict(dict(
            output_dir=args.output_dir,
            num_train_epochs=args.num_train_epochs,
            per_device_train_batch_size=args.per_device_train_batch_size,
            learning_rate=args.learning_rate,
            warmup_steps=args.warmup_steps,
            logging_steps=args.logging_steps,
            max_steps=args.max_steps,
            seed=args.seed,
            optimizer="adamw",
            evaluation_strategy="no",
        )),
        train_group_size=args.train_group_size,
        max_len=args.max_len,
        knowledge_distillation=args.knowledge_distillation,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
    )
    runner.run(resume_from_checkpoint=args.resume_from_checkpoint)


if __name__ == "__main__":
    main()
