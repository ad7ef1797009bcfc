"""Text-embedder training CLI (parity: Nexus/training/embedder/
text_retrieval/__main__.py's HfArgumentParser entry).

    python -m nexus_tpu.training.embedder.text_retrieval \
        --model_name_or_path /path/to/bge --train_data a.jsonl b.jsonl \
        --output_dir ./out --num_train_epochs 1 ...
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    # model args
    ap.add_argument("--model_name_or_path", required=True)
    ap.add_argument("--sentence_pooling_method", default="cls")
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--kd_loss_type", default="kl_div")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gradient_checkpointing", action="store_true")
    # data args
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--train_group_size", type=int, default=8)
    ap.add_argument("--query_max_len", type=int, default=512)
    ap.add_argument("--passage_max_len", type=int, default=512)
    ap.add_argument("--query_instruction_for_retrieval", default=None)
    ap.add_argument("--knowledge_distillation", action="store_true")
    ap.add_argument("--no_in_batch_neg_flag", action="store_true")
    ap.add_argument("--same_dataset_within_batch", action="store_true")
    ap.add_argument("--pack_sequences", action="store_true",
                    help="pack ragged batches into dense rows (block-diagonal "
                         "segment attention; ~2.5x on real-data mixes)")
    ap.add_argument("--pack_row_len", type=int, default=512)
    # training args
    ap.add_argument("--output_dir", default="./saves/text_embedder")
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--per_device_train_batch_size", type=int, default=16)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=1)
    ap.add_argument("--learning_rate", type=float, default=1e-5)
    ap.add_argument("--warmup_steps", type=int, default=0)
    ap.add_argument("--logging_steps", type=int, default=20)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume_from_checkpoint", default=None)
    args = ap.parse_args()

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval import (
        TextEmbedderDataArguments,
        TextEmbedderModelArguments,
        TextEmbedderRunner,
    )

    runner = TextEmbedderRunner(
        TextEmbedderModelArguments(
            model_name_or_path=args.model_name_or_path,
            sentence_pooling_method=args.sentence_pooling_method,
            temperature=args.temperature,
            kd_loss_type=args.kd_loss_type,
            dtype=args.dtype,
            gradient_checkpointing=args.gradient_checkpointing,
        ),
        TextEmbedderDataArguments(
            train_data=args.train_data,
            train_group_size=args.train_group_size,
            query_max_len=args.query_max_len,
            passage_max_len=args.passage_max_len,
            query_instruction_for_retrieval=args.query_instruction_for_retrieval,
            knowledge_distillation=args.knowledge_distillation,
            no_in_batch_neg_flag=args.no_in_batch_neg_flag,
            same_dataset_within_batch=args.same_dataset_within_batch,
            pack_sequences=args.pack_sequences,
            pack_row_len=args.pack_row_len,
        ),
        TrainingArguments.from_dict(
            dict(
                output_dir=args.output_dir,
                num_train_epochs=args.num_train_epochs,
                per_device_train_batch_size=args.per_device_train_batch_size,
                gradient_accumulation_steps=args.gradient_accumulation_steps,
                learning_rate=args.learning_rate,
                warmup_steps=args.warmup_steps,
                logging_steps=args.logging_steps,
                max_steps=args.max_steps,
                seed=args.seed,
                optimizer="adamw",
                evaluation_strategy="no",
            )
        ),
    )
    runner.run(resume_from_checkpoint=args.resume_from_checkpoint)


if __name__ == "__main__":
    main()
