import json
import os

import numpy as np
import pytest

from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.text_retrieval import (
    TextEmbedderDataArguments,
    TextEmbedderModelArguments,
    TextEmbedderRunner,
)
from nexus_tpu.training.reranker.text_retrieval import TextRerankerRunner


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    """A tiny local HF BERT checkpoint + wordpiece tokenizer (offline)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = tmp_path_factory.mktemp("tiny_bert")
    words = ["the", "a", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue",
             "sky", "sea", "tree", "car", "city", "query", "doc", "good", "bad", "fish"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words + [f"##{w}" for w in words]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    BertModel(cfg).save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def train_jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp("text_data")
    path = d / "train.jsonl"
    rng = np.random.default_rng(0)
    words = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue", "sky"]
    with open(path, "w") as f:
        for i in range(64):
            topic = words[i % len(words)]
            rec = {
                "query": f"query about {topic}",
                "pos": [f"{topic} {topic} document"],
                "neg": [f"{w} unrelated text" for w in rng.choice(words, 3)],
                "pos_scores": [1.0],
                "neg_scores": [0.2, 0.1, 0.05],
            }
            f.write(json.dumps(rec) + "\n")
    return str(path)


def _train_args(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path / "out"),
        num_train_epochs=1,
        per_device_train_batch_size=2,  # *8 virtual devices = 16 global
        learning_rate=1e-3,
        logging_steps=1,
        optimizer="adamw",
        evaluation_strategy="no",
    )
    base.update(kw)
    return TrainingArguments.from_dict(base)


def test_text_embedder_trains_and_saves(tiny_hf_dir, train_jsonl, tmp_path):
    margs = TextEmbedderModelArguments(
        model_name_or_path=tiny_hf_dir, temperature=0.05, dtype="float32"
    )
    dargs = TextEmbedderDataArguments(
        train_data=[train_jsonl], train_group_size=3, query_max_len=16, passage_max_len=16
    )
    runner = TextEmbedderRunner(margs, dargs, _train_args(tmp_path))
    state = runner.run()
    assert int(state.step) > 0
    out = runner.training_args.output_dir
    assert os.path.exists(os.path.join(out, "flax_model.msgpack"))

    # reload and encode
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel

    model2 = BiTextEmbedderModel.from_pretrained(out)
    import jax.numpy as jnp

    enc = runner.tokenizer(["the dog runs"], padding="max_length", truncation=True,
                           max_length=16, return_tensors="np")
    reps = model2.encode(model2.variables, jnp.asarray(enc["input_ids"]),
                         jnp.asarray(enc["attention_mask"]))
    assert reps.shape == (1, 32)
    assert np.allclose(np.linalg.norm(np.asarray(reps), axis=-1), 1.0, atol=1e-3)


def test_text_embedder_kd_regimes(tiny_hf_dir, train_jsonl, tmp_path):
    margs = TextEmbedderModelArguments(model_name_or_path=tiny_hf_dir, dtype="float32",
                                       kd_loss_type="m3_kd_loss")
    dargs = TextEmbedderDataArguments(
        train_data=[train_jsonl], train_group_size=3, query_max_len=16,
        passage_max_len=16, knowledge_distillation=True,
    )
    runner = TextEmbedderRunner(margs, dargs, _train_args(tmp_path, max_steps=3))
    state = runner.run()
    assert int(state.step) > 0


def test_text_embedder_no_in_batch_flag(tiny_hf_dir, train_jsonl, tmp_path):
    margs = TextEmbedderModelArguments(model_name_or_path=tiny_hf_dir, dtype="float32")
    dargs = TextEmbedderDataArguments(
        train_data=[train_jsonl], train_group_size=3, query_max_len=16,
        passage_max_len=16, no_in_batch_neg_flag=True,
    )
    runner = TextEmbedderRunner(margs, dargs, _train_args(tmp_path, max_steps=3))
    assert int(runner.run().step) > 0


def test_cross_encoder_reranker_trains(tiny_hf_dir, train_jsonl, tmp_path):
    runner = TextRerankerRunner(
        model_name_or_path=tiny_hf_dir,
        train_data=[train_jsonl],
        training_args=_train_args(tmp_path, max_steps=3),
        train_group_size=3,
        max_len=24,
    )
    state = runner.run()
    assert int(state.step) > 0
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel

    model2 = CrossEncoderModel.from_pretrained(runner.training_args.output_dir)
    assert model2.variables is not None


def test_cross_encoder_reranker_trains_packed(tiny_hf_dir, train_jsonl, tmp_path):
    """pack_pairs=True trains through the full trainer (packed rows shard
    over the 8-device mesh; pool gathers stay global under GSPMD)."""
    runner = TextRerankerRunner(
        model_name_or_path=tiny_hf_dir,
        train_data=[train_jsonl],
        training_args=_train_args(tmp_path, max_steps=3),
        train_group_size=3,
        max_len=24,
        pack_pairs=True,
    )
    assert runner.collator.pack
    state = runner.run()
    assert int(state.step) == 3
