"""Offline smoke run of the text-retrieval pipeline: builds a tiny local
BERT checkpoint + BGE-format jsonl, fine-tunes the bi-encoder, evaluates
retrieve->rerank on a toy BEIR-layout dataset — zero downloads.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

WORDS = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue", "sky",
         "sea", "tree", "car", "city", "query", "doc", "good", "fish", "bird", "sun"]


def build_tiny_checkpoint(d: str) -> str:
    from transformers import BertConfig, BertModel, BertTokenizerFast

    os.makedirs(d, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt")).save_pretrained(d)
    BertModel(BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)).save_pretrained(d)
    return d


def build_train_data(path: str) -> str:
    import numpy as np

    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(64):
            topic = WORDS[i % len(WORDS)]
            rec = {"query": f"query about {topic}",
                   "pos": [f"{topic} {topic} doc"],
                   "neg": [f"{w} doc" for w in rng.choice(WORDS, 3)]}
            f.write(json.dumps(rec) + "\n")
    return path


def main():
    root = tempfile.mkdtemp(prefix="nexus_text_smoke_")
    model_dir = build_tiny_checkpoint(os.path.join(root, "tiny_bert"))
    train_data = build_train_data(os.path.join(root, "train.jsonl"))

    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval import (
        TextEmbedderDataArguments, TextEmbedderModelArguments, TextEmbedderRunner,
    )

    out = os.path.join(root, "embedder")
    TextEmbedderRunner(
        TextEmbedderModelArguments(model_name_or_path=model_dir, dtype="float32",
                                   temperature=0.05),
        TextEmbedderDataArguments(train_data=[train_data], train_group_size=3,
                                  query_max_len=16, passage_max_len=16),
        TrainingArguments.from_dict({
            "output_dir": out, "num_train_epochs": 2,
            "per_device_train_batch_size": 2, "learning_rate": 1e-3,
            "logging_steps": 5, "optimizer": "adamw", "evaluation_strategy": "no",
        }),
    ).run()

    # toy eval dataset + retrieve->rerank
    ds_dir = os.path.join(root, "datasets", "toy")
    os.makedirs(ds_dir, exist_ok=True)
    docs = {f"d{i}": f"{w} {w} doc" for i, w in enumerate(WORDS[:8])}
    with open(os.path.join(ds_dir, "corpus.jsonl"), "w") as f:
        for did, text in docs.items():
            f.write(json.dumps({"_id": did, "text": text}) + "\n")
    with open(os.path.join(ds_dir, "queries.jsonl"), "w") as f:
        for i, w in enumerate(WORDS[:4]):
            f.write(json.dumps({"_id": f"q{i}", "text": f"query about {w}"}) + "\n")
    with open(os.path.join(ds_dir, "qrels.tsv"), "w") as f:
        for i in range(4):
            f.write(f"q{i}\td{i}\t1\n")

    from nexus_tpu.evaluation.text_retrieval.runner import (
        TextRetrievalEvalArguments, TextRetrievalEvalRunner,
    )

    results = TextRetrievalEvalRunner(TextRetrievalEvalArguments(
        dataset_dir=os.path.join(root, "datasets"), dataset_names=["toy"],
        eval_output_dir=os.path.join(root, "eval"),
        embedder_name_or_path=out, search_top_k=8, k_values=[1, 3],
        embedder_batch_size=4,
    )).run()
    print("smoke eval:", results["toy"]["NoReranker"])
    print(f"artifacts under {root}")


if __name__ == "__main__":
    main()
