"""Decoder-backbone (LLM) cross-encoder reranker: torch parity, yes-logit
init, training round-trip through the inference engine, and eval-runner
acceptance (VERDICT r2 item 1)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.llama import LlamaConfig
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.text_retrieval.decoder_only import (
    DecoderCrossEncoderModel,
    load_reranker_model,
)

TINY = dict(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
)


def _batch(rng, n=4, L=12, vocab=64):
    ids = rng.integers(2, vocab - 1, (n, L))
    mask = np.ones((n, L), np.int64)
    mask[0, L - 3 :] = 0  # right padding on one row exercises last-token pooling
    ids = ids * mask
    return ids.astype(np.int64), mask


@pytest.fixture(scope="module")
def hf_seqcls_dir(tmp_path_factory):
    """Tiny torch LlamaForSequenceClassification checkpoint (num_labels=1)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLC, LlamaForSequenceClassification

    d = tmp_path_factory.mktemp("tiny_llama_cls")
    cfg = HFLC(**TINY, num_labels=1, pad_token_id=0)
    torch.manual_seed(0)
    m = LlamaForSequenceClassification(cfg).eval()
    m.save_pretrained(str(d))
    return str(d), m


def test_matches_hf_seq_classification(hf_seqcls_dir, rng):
    """Scores equal HF LlamaForSequenceClassification (last non-pad token
    pooled through the bias-free score head)."""
    torch = pytest.importorskip("torch")
    model_dir, hf = hf_seqcls_dir
    model = DecoderCrossEncoderModel.from_pretrained(model_dir, dtype="float32")

    ids, mask = _batch(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits[:, 0].numpy()
    ours = np.asarray(
        model.scores(model.variables, {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
    )
    assert np.abs(ours - ref).max() < 5e-4


def test_causal_lm_yes_logit_init(tmp_path, rng):
    """Importing a causal-LM checkpoint initializes the score head to
    w_yes - w_no: the score equals (yes logit - no logit) at the last valid
    position of the torch causal LM."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLC, LlamaForCausalLM

    d = tmp_path / "tiny_llama_lm"
    cfg = HFLC(**TINY, pad_token_id=0, tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(str(d))

    yes_id, no_id = 7, 9

    class StubTok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [yes_id if text == "Yes" else no_id]}

    model = DecoderCrossEncoderModel.from_pretrained(
        str(d), dtype="float32", tokenizer=StubTok()
    )
    ids, mask = _batch(rng)
    with torch.no_grad():
        logits = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits
    last = mask.sum(1) - 1
    ref = np.stack(
        [logits[i, last[i], yes_id].item() - logits[i, last[i], no_id].item() for i in range(len(ids))]
    )
    ours = np.asarray(
        model.scores(model.variables, {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
    )
    assert np.abs(ours - ref).max() < 5e-4


def _toy_reranker_jsonl(path, n=32):
    words = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue", "sky"]
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(n):
            topic = words[i % len(words)]
            rec = {
                "query": f"query about {topic}",
                "pos": [f"{topic} {topic} document"],
                "neg": [f"{w} unrelated" for w in rng.choice(words, 3)],
            }
            f.write(json.dumps(rec) + "\n")


@pytest.fixture(scope="module")
def bert_tok_dir(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("llama_tok")
    words = ["the", "a", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue",
             "sky", "query", "about", "document", "unrelated"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    return str(d)


def test_train_save_roundtrip_inference(tmp_path, bert_tok_dir):
    """Train a tiny LoRA decoder reranker with the generic runner, save, and
    reload through the TextReranker inference engine: scores from the engine
    match the model's direct forward; only adapters + score head trained."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker
    from nexus_tpu.training.reranker.text_retrieval import TextRerankerRunner

    # base HF-style checkpoint dir for the runner: our own save format
    base_dir = tmp_path / "base"
    cfg = LlamaConfig(**TINY)
    base = DecoderCrossEncoderModel(cfg, dtype="float32")
    base.variables = base.init_variables(jax.random.PRNGKey(0))
    base.save(str(base_dir), base.variables)
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    tok.save_pretrained(str(base_dir))

    data = tmp_path / "train.jsonl"
    _toy_reranker_jsonl(str(data))

    out_dir = tmp_path / "out"
    args = TrainingArguments(
        output_dir=str(out_dir), num_train_epochs=1, per_device_train_batch_size=2,
        learning_rate=1e-3, logging_steps=10, seed=0,
    )
    runner = TextRerankerRunner(
        str(base_dir), [str(data)], args, train_group_size=4, max_len=16,
        lora_rank=2,
    )
    assert isinstance(runner.model, DecoderCrossEncoderModel)
    before = jax.tree_util.tree_map(np.asarray, runner.model.variables["params"]["model"])
    state = runner.run()

    # frozen trunk base kernels unchanged (adapter-only training)
    after = state.params["model"]

    def _leaf(tree, *path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    np.testing.assert_array_equal(
        _leaf(before, "layers", "layer", "self_attn", "q_proj", "base", "kernel"),
        _leaf(after, "layers", "layer", "self_attn", "q_proj", "base", "kernel"),
    )

    # reload through the inference engine (dispatch by config.json)
    rr = TextReranker(model_name_or_path=str(out_dir), max_length=16, batch_size=4)
    assert isinstance(rr.model, DecoderCrossEncoderModel)
    pairs = [("query about dog", "dog dog document"), ("query about dog", "sky unrelated")]
    scores = rr.compute_score(pairs, normalize=False)
    assert len(scores) == 2 and np.isfinite(scores).all()

    # engine scores match a direct forward with the same tokenization
    enc = rr.tokenizer(
        [p[0] for p in pairs], [p[1] for p in pairs],
        padding="max_length", truncation=True, max_length=16, return_tensors="np",
    )
    direct = np.asarray(
        rr.model.scores(
            rr.model.variables,
            {
                "input_ids": jnp.asarray(enc["input_ids"].astype(np.int32)),
                "attention_mask": jnp.asarray(enc["attention_mask"].astype(np.int32)),
            },
        )
    )
    np.testing.assert_allclose(np.asarray(scores), direct, rtol=1e-4, atol=1e-4)


def test_factory_dispatch_bert(tmp_path):
    """config.json model_type=bert routes to the BERT CrossEncoderModel."""
    from transformers import BertConfig as HFBertConfig, BertForSequenceClassification

    pytest.importorskip("torch")
    d = tmp_path / "bert_cls"
    cfg = HFBertConfig(
        vocab_size=32, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32, num_labels=1,
    )
    BertForSequenceClassification(cfg).save_pretrained(str(d))
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel

    model = load_reranker_model(str(d), lora_rank=4)  # lora kwargs dropped for BERT
    assert isinstance(model, CrossEncoderModel)


def test_eval_runner_accepts_decoder_reranker(tmp_path, bert_tok_dir):
    """The text IR eval runner takes a decoder reranker as the rerank stage."""
    from transformers import AutoTokenizer

    from nexus_tpu.evaluation.text_retrieval.runner import (
        TextRetrievalEvalArguments,
        TextRetrievalEvalRunner,
    )

    # decoder reranker checkpoint
    rr_dir = tmp_path / "rr"
    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    model.save(str(rr_dir), model.variables)
    AutoTokenizer.from_pretrained(bert_tok_dir).save_pretrained(str(rr_dir))

    # tiny embedder checkpoint (reuse the BERT test fixture layout)
    import torch  # noqa: F401  (importorskip side effect in other tests)
    from transformers import BertConfig as HFBertConfig, BertModel

    emb_dir = tmp_path / "emb"
    BertModel(
        HFBertConfig(
            vocab_size=20, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, max_position_embeddings=32,
        )
    ).save_pretrained(str(emb_dir))
    AutoTokenizer.from_pretrained(bert_tok_dir).save_pretrained(str(emb_dir))

    # BEIR-layout toy dataset
    ds = tmp_path / "data" / "toy"
    os.makedirs(ds)
    with open(ds / "corpus.jsonl", "w") as f:
        for i, t in enumerate(["dog dog document", "sky unrelated", "cat runs fast"]):
            f.write(json.dumps({"_id": f"d{i}", "title": "", "text": t}) + "\n")
    with open(ds / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q0", "text": "query about dog"}) + "\n")
    with open(ds / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\nq0\td0\t1\n")

    args = TextRetrievalEvalArguments(
        dataset_dir=str(tmp_path / "data"), dataset_names=["toy"],
        eval_output_dir=str(tmp_path / "eval_out"),
        embedder_name_or_path=str(emb_dir),
        reranker_name_or_path=str(rr_dir),
        search_top_k=3, rerank_top_k=3, k_values=[1, 3],
        embedder_batch_size=4,
    )
    out = TextRetrievalEvalRunner(args).run()
    assert "Reranked" in out["toy"] and "NDCG@1" in out["toy"]["Reranked"]


def test_qwen2_seqcls_parity(tmp_path, rng):
    """Qwen2 backbone (QKV biases, GQA) through the decoder cross-encoder:
    scores match HF Qwen2ForSequenceClassification. Regression for the
    dispatch bug where Qwen2 biases were silently dropped."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQ2, Qwen2ForSequenceClassification

    d = tmp_path / "tiny_qwen2_cls"
    cfg = HFQ2(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        num_labels=1, pad_token_id=0,
    )
    torch.manual_seed(2)
    hf = Qwen2ForSequenceClassification(cfg).eval()
    hf.save_pretrained(str(d))

    model = DecoderCrossEncoderModel.from_pretrained(str(d), dtype="float32")
    assert model.llama_config.attention_bias  # qwen2 -> QKV biases honored
    ids, mask = _batch(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits[:, 0].numpy()
    ours = np.asarray(
        model.scores(model.variables, {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
    )
    assert np.abs(ours - ref).max() < 5e-4


def test_qwen3_seqcls_parity(tmp_path, rng):
    """Qwen3 backbone (per-head q/k RMSNorm, decoupled head_dim) through the
    decoder cross-encoder: scores match HF Qwen3ForSequenceClassification."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFQ3, Qwen3ForSequenceClassification

    d = tmp_path / "tiny_qwen3_cls"
    cfg = HFQ3(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,  # != 32/4
        max_position_embeddings=64, num_labels=1, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = Qwen3ForSequenceClassification(cfg).eval()
    hf.save_pretrained(str(d))

    model = DecoderCrossEncoderModel.from_pretrained(str(d), dtype="float32")
    assert model.llama_config.qk_norm and model.llama_config.head_dim == 16
    ids, mask = _batch(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits[:, 0].numpy()
    ours = np.asarray(
        model.scores(model.variables, {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
    )
    assert np.abs(ours - ref).max() < 5e-4


def test_pair_template_formatting(tmp_path, bert_tok_dir):
    """pair_template formats each pair into ONE sequence (LLM prompt mode);
    engine scores then equal a direct forward over the formatted texts."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker

    d = tmp_path / "m"
    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    model.save(str(d), model.variables)
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    tok.save_pretrained(str(d))

    tpl = "query: {query} document: {passage}"
    rr = TextReranker(model_name_or_path=str(d), max_length=16, batch_size=4,
                      pair_template=tpl)
    pairs = [("dog runs", "dog document"), ("cat sits", "sky unrelated")]
    scores = rr.compute_score(pairs, normalize=False)

    enc = rr.tokenizer(
        [tpl.format(query=q, passage=p) for q, p in pairs],
        padding="max_length", truncation=True, max_length=16, return_tensors="np",
    )
    direct = np.asarray(rr.model.scores(rr.model.variables, {
        "input_ids": jnp.asarray(enc["input_ids"].astype(np.int32)),
        "attention_mask": jnp.asarray(enc["attention_mask"].astype(np.int32)),
    }))
    np.testing.assert_allclose(np.asarray(scores), direct, rtol=1e-4, atol=1e-4)

    # training collator emits the same single-sequence layout
    from nexus_tpu.training.reranker.text_retrieval.dataset import TextRerankerCollator

    col = TextRerankerCollator(rr.tokenizer, max_len=16, pair_template=tpl)
    batch = col([{"query": pairs[0][0], "passages": [pairs[0][1], pairs[1][1]]}])
    assert batch["input_ids"].shape == (2, 16)
    row0 = rr.tokenizer(tpl.format(query=pairs[0][0], passage=pairs[0][1]),
                        padding="max_length", truncation=True, max_length=16,
                        return_tensors="np")["input_ids"][0]
    np.testing.assert_array_equal(batch["input_ids"][0], row0.astype(np.int32))


def test_merged_save_reload_no_double_lora(tmp_path):
    """Reloading a merged LoRA save must NOT re-apply the adapter file:
    scores after reload equal the merged model's scores exactly."""
    cfg = LlamaConfig(**TINY, lora_rank=2)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    variables = model.init_variables(jax.random.PRNGKey(0))
    # make the adapters non-trivial (zero-init B would hide the bug)
    import jax.numpy as _jnp

    def bump(t):
        if isinstance(t, dict):
            return {k: (np.asarray(v) + 0.05 if k in ("lora_A", "lora_B") else bump(v))
                    for k, v in t.items()}
        return t
    variables = {"params": bump(variables["params"])}
    model.variables = variables

    out = tmp_path / "out"
    model.save(str(out), variables)          # adapters
    model.save_merged_model(str(out), variables)  # merged weights + marker

    rng = np.random.default_rng(1)
    ids, mask = _batch(rng)
    batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}
    want = np.asarray(model.scores(variables, batch))

    re = DecoderCrossEncoderModel.from_pretrained(str(out), dtype="float32")
    got = np.asarray(re.scores(re.variables, batch))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_packed_scoring_parity_decoder(bert_tok_dir):
    """TextReranker(packing=True) scores EQUAL the padded path for the
    decoder cross-encoder: per-segment causal attention + per-segment
    last-token pooling (ops/packing.py layout through LlamaModel
    segment_ids)."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker

    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    pairs = [
        ("query about dog", "dog dog document runs fast"),
        ("query about sky", "blue sky"),
        ("query about cat", "cat sits slow cat document unrelated red blue"),
        ("a", "the"),
        ("query about red", "red red red"),
    ]
    padded = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32)
    packed = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32,
                          packing=True)
    s_pad = padded.compute_score(pairs, normalize=False)
    s_pk = packed.compute_score(pairs, normalize=False)
    np.testing.assert_allclose(np.asarray(s_pk), np.asarray(s_pad),
                               rtol=1e-4, atol=1e-4)


def test_packed_scoring_parity_bert(bert_tok_dir):
    """Same parity through the BERT cross-encoder family (CLS pooling +
    token_type_ids riding the packed slots)."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker
    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = CrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    pairs = [
        ("query about dog", "dog dog document runs fast"),
        ("query about sky", "blue sky"),
        ("query about cat", "cat sits slow cat document unrelated red blue"),
    ]
    padded = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32)
    packed = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32,
                          packing=True)
    s_pad = padded.compute_score(pairs, normalize=False)
    s_pk = packed.compute_score(pairs, normalize=False)
    np.testing.assert_allclose(np.asarray(s_pk), np.asarray(s_pad),
                               rtol=1e-4, atol=1e-4)


def test_packed_scoring_aot_session_parity(bert_tok_dir):
    """packing=True with a non-normal infer_mode scores through bucketed
    AOT executables of the PACKED program (pool_rows-led feed) and matches
    the padded normal path."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker

    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    pairs = [
        ("query about dog", "dog dog document runs fast"),
        ("query about sky", "blue sky"),
        ("query about cat", "cat sits slow cat document unrelated red"),
        ("a", "the"),
    ]
    padded = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32)
    packed_aot = TextReranker(model=model, tokenizer=tok, batch_size=8,
                              max_length=32, packing=True, infer_mode="onnx")
    assert packed_aot._packed_session is not None
    s_pad = padded.compute_score(pairs, normalize=False)
    s_aot = packed_aot.compute_score(pairs, normalize=False)
    np.testing.assert_allclose(np.asarray(s_aot), np.asarray(s_pad),
                               rtol=1e-4, atol=1e-4)


def test_multichip_sharded_reranker(bert_tok_dir):
    """Mesh-sharded reranker scoring parity (replaces the reference's
    per-GPU reranker process pool): same pairs score identically through a
    single-device session and a batch-sharded 8-device mesh session."""
    import jax as _jax

    if len(_jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import TextReranker
    from nexus_tpu.parallel.mesh import get_default_mesh

    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    pairs = [
        ("query about dog", "dog dog document runs fast"),
        ("query about sky", "blue sky"),
        ("query about cat", "cat sits slow"),
        ("a", "the"),
        ("query about red", "red red red"),  # 5 pairs: exercises row padding
    ]
    single = TextReranker(model=model, tokenizer=tok, batch_size=8, max_length=32)
    sharded = TextReranker(model=model, tokenizer=tok, batch_size=8,
                           max_length=32, mesh=get_default_mesh())
    s1 = single.compute_score(pairs, normalize=False)
    s2 = sharded.compute_score(pairs, normalize=False)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)


def test_packed_export_roundtrip(tmp_path, bert_tok_dir):
    """convert_to_serialized with packing=True exports the PACKED program;
    the deserialized artifact reproduces the live packed scores through
    run(input_feed) — the ONNX-file-parity contract for the served path."""
    from transformers import AutoTokenizer

    from nexus_tpu.inference.reranker.text_retrieval import (
        BaseRerankerInferenceEngine,
    )
    from nexus_tpu.inference.session import AOTSession
    from nexus_tpu.ops.packing import pack_tokenized

    cfg = LlamaConfig(**TINY)
    model = DecoderCrossEncoderModel(cfg, dtype="float32")
    model.variables = model.init_variables(jax.random.PRNGKey(0))
    tok = AutoTokenizer.from_pretrained(bert_tok_dir)
    engine = BaseRerankerInferenceEngine(
        model=model, tokenizer=tok, batch_size=8, max_length=32,
        packing=True, infer_mode="onnx")
    pairs = [("query about dog", "dog dog document"),
             ("query about sky", "blue sky unrelated"),
             ("a", "the red cat")]
    live = engine.compute_score(pairs, normalize=False)

    path = str(tmp_path / "packed.shlo")
    engine.convert_to_serialized(path)
    restored = AOTSession.deserialize(open(path, "rb").read())

    enc = tok([p[0] for p in pairs], [p[1] for p in pairs], padding=True,
              truncation=True, max_length=32, return_tensors="np")
    pk = pack_tokenized(enc["input_ids"].astype(np.int32),
                        enc["attention_mask"].astype(np.int32), row_len=32,
                        row_bucket=8,
                        extras={"token_type_ids": enc["token_type_ids"].astype(np.int32)})
    feed = {k: np.asarray(pk[k], np.int32) for k in engine._PACKED_NAMES}
    out = np.asarray(restored.run(None, feed)[0])[: len(pairs)]
    np.testing.assert_allclose(out, np.asarray(live), rtol=1e-4, atol=1e-4)
