"""Repository-friendly multimodal smoke training (parity: the reference's
examples/multimodal_retrieval README smoke flow)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from transformers import BertTokenizerFast

from nexus_tpu.models.vlm import VLMConfig
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.multimodal_retrieval import (
    BiMultimodalEmbedderModel, MultimodalEmbedderRunner,
)
from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments

HERE = os.path.dirname(os.path.abspath(__file__))


def build_tokenizer():
    vocab_path = os.path.join(HERE, "data", "vocab.txt")
    if not os.path.exists(vocab_path):
        words = ["a", "red", "green", "blue", "square", "colored", "image"]
        with open(vocab_path, "w") as f:
            f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))
    return BertTokenizerFast(vocab_file=vocab_path)


def main():
    tokenizer = build_tokenizer()
    model = BiMultimodalEmbedderModel(
        VLMConfig.tiny(), TextEmbedderModelArguments(dtype="float32", temperature=0.05)
    )
    runner = MultimodalEmbedderRunner(
        model, tokenizer,
        [os.path.join(HERE, "data", "train.jsonl")],
        TrainingArguments.from_dict({
            "output_dir": "/tmp/nexus_mm_smoke", "num_train_epochs": 4,
            "per_device_train_batch_size": 1, "learning_rate": 1e-3,
            "logging_steps": 1, "evaluation_strategy": "no",
        }),
        train_group_size=3, media_root=os.path.join(HERE, "data"), max_length=48,
    )
    state = runner.run()
    model.variables = state.variables
    print("smoke training done -> /tmp/nexus_mm_smoke")
    return model, tokenizer


if __name__ == "__main__":
    main()
