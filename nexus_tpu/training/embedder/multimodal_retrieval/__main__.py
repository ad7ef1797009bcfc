"""Multimodal-embedder training CLI (parity: the reference's
``torchrun -m Nexus.training.embedder.multimodal_retrieval`` HfArgumentParser
entry driven by examples/multimodal_retrieval/training/run_qwen_vl_lora.sh).

    python -m nexus_tpu.training.embedder.multimodal_retrieval \
        --model_name_or_path /path/to/qwen2-vl --train_data train.jsonl \
        --output_dir ./out --use_lora --lora_r 64 --use_chat_template ...

Loads a real HF Qwen-VL-family checkpoint (or a nexus multimodal save dir),
optionally wraps the text trunk's attention projections with LoRA adapters,
and runs the contrastive fine-tune on the device mesh.
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    # model args
    ap.add_argument("--model_name_or_path", required=True)
    ap.add_argument("--sentence_pooling_method", default="last_token")
    ap.add_argument("--temperature", type=float, default=0.02)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--gradient_checkpointing", action="store_true")
    ap.add_argument("--image_size", type=int, default=224,
                    help="pinned processor resolution (static patch grid)")
    ap.add_argument("--use_chat_template", action="store_true",
                    help="wrap items in the Qwen conversation template")
    ap.add_argument("--use_lora", action="store_true")
    ap.add_argument("--lora_r", type=int, default=64)
    ap.add_argument("--lora_alpha", type=float, default=128.0)
    ap.add_argument("--save_merged_model", action="store_true",
                    help="also export base+adapters folded into plain weights")
    # data args
    ap.add_argument("--train_data", nargs="+", required=True)
    ap.add_argument("--train_group_size", type=int, default=4)
    ap.add_argument("--max_length", type=int, default=256,
                    help="per-item token budget incl. image placeholders")
    ap.add_argument("--media_root", default=None)
    ap.add_argument("--query_instruction_for_retrieval", default=None)
    # training args
    ap.add_argument("--output_dir", default="./saves/multimodal_embedder")
    ap.add_argument("--num_train_epochs", type=int, default=1)
    ap.add_argument("--per_device_train_batch_size", type=int, default=4)
    ap.add_argument("--learning_rate", type=float, default=2e-5)
    ap.add_argument("--warmup_steps", type=int, default=0)
    ap.add_argument("--logging_steps", type=int, default=10)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume_from_checkpoint", default=None)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (
        BiMultimodalEmbedderModel,
    )
    from nexus_tpu.training.embedder.multimodal_retrieval.runner import (
        MultimodalEmbedderRunner,
    )
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )

    model_args = TextEmbedderModelArguments(
        model_name_or_path=args.model_name_or_path,
        sentence_pooling_method=args.sentence_pooling_method,
        temperature=args.temperature,
        dtype=args.dtype,
        gradient_checkpointing=args.gradient_checkpointing,
    )
    lora_rank = args.lora_r if args.use_lora else 0
    if os.path.exists(os.path.join(args.model_name_or_path, "flax_model.msgpack")):
        model = BiMultimodalEmbedderModel.from_pretrained(args.model_name_or_path, model_args)
    else:
        model = BiMultimodalEmbedderModel.from_hf_pretrained(
            args.model_name_or_path, model_args, image_size=args.image_size,
            lora_rank=lora_rank, lora_alpha=args.lora_alpha,
        )
    tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)

    training_args = TrainingArguments.from_dict(dict(
        output_dir=args.output_dir,
        num_train_epochs=args.num_train_epochs,
        per_device_train_batch_size=args.per_device_train_batch_size,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        logging_steps=args.logging_steps,
        seed=args.seed,
        **({"max_steps": args.max_steps} if args.max_steps else {}),
    ))
    runner = MultimodalEmbedderRunner(
        model, tokenizer, args.train_data, training_args,
        train_group_size=args.train_group_size,
        media_root=args.media_root,
        max_length=args.max_length,
        query_instruction=args.query_instruction_for_retrieval,
        use_chat_template=args.use_chat_template,
    )
    state = runner.run(resume_from_checkpoint=args.resume_from_checkpoint)
    if args.use_lora and args.save_merged_model:
        merged_dir = os.path.join(args.output_dir, "merged")
        model.save_merged_model(merged_dir, state.variables)
        tokenizer.save_pretrained(merged_dir)  # self-contained inference dir
    return state


if __name__ == "__main__":
    main()
