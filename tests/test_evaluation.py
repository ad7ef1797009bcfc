import json

import numpy as np
import pytest

from nexus_tpu.evaluation.ir_metrics import evaluate_ir_metrics, mrr_at_k


def test_ir_metrics_perfect_ranking():
    qrels = {"q1": {"d1": 1, "d2": 1}, "q2": {"d3": 1}}
    results = {
        "q1": {"d1": 0.9, "d2": 0.8, "d4": 0.1},
        "q2": {"d3": 0.9, "d5": 0.5},
    }
    ndcg, _map, recall, precision = evaluate_ir_metrics(qrels, results, (1, 3))
    assert ndcg["NDCG@3"] == 1.0
    assert recall["Recall@3"] == 1.0
    assert _map["MAP@3"] == 1.0
    mrr = mrr_at_k(qrels, results, (3,))
    assert mrr["MRR@3"] == 1.0


def test_ir_metrics_partial():
    qrels = {"q1": {"d1": 1}}
    results = {"q1": {"d9": 0.9, "d1": 0.8}}  # relevant at rank 2
    ndcg, _map, recall, precision = evaluate_ir_metrics(qrels, results, (1, 2))
    assert ndcg["NDCG@1"] == 0.0
    assert recall["Recall@1"] == 0.0
    assert recall["Recall@2"] == 1.0
    assert np.isclose(ndcg["NDCG@2"], 1 / np.log2(3), atol=1e-4)
    assert mrr_at_k(qrels, results, (2,))["MRR@2"] == 0.5


def test_ir_metrics_graded_relevance_order_matters():
    qrels = {"q": {"a": 2, "b": 1}}
    good = {"q": {"a": 0.9, "b": 0.8}}
    bad = {"q": {"a": 0.8, "b": 0.9}}
    ndcg_good, *_ = evaluate_ir_metrics(qrels, good, (2,))
    ndcg_bad, *_ = evaluate_ir_metrics(qrels, bad, (2,))
    assert ndcg_good["NDCG@2"] > ndcg_bad["NDCG@2"]


def test_end_to_end_eval_runner(tmp_path):
    """Full text IR eval: local BEIR-layout dataset -> retrieve -> (rerank)
    -> metrics -> json + markdown outputs."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "model"
    d.mkdir()
    words = ["the", "dog", "cat", "runs", "sits", "fast", "sky", "sea", "red", "blue"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64)).save_pretrained(str(d))

    ds_dir = tmp_path / "datasets" / "toy"
    ds_dir.mkdir(parents=True)
    docs = {"d1": "the dog runs fast", "d2": "the cat sits", "d3": "red sky at night"}
    with open(ds_dir / "corpus.jsonl", "w") as f:
        for did, text in docs.items():
            f.write(json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(ds_dir / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "dog runs"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "red sky"}) + "\n")
    with open(ds_dir / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\nq2\td3\t1\n")

    from nexus_tpu.evaluation.text_retrieval.runner import (
        TextRetrievalEvalArguments,
        TextRetrievalEvalRunner,
    )

    args = TextRetrievalEvalArguments(
        dataset_dir=str(tmp_path / "datasets"),
        dataset_names=["toy"],
        eval_output_dir=str(tmp_path / "out"),
        embedder_name_or_path=str(d),
        reranker_name_or_path=str(d),
        search_top_k=3,
        rerank_top_k=3,
        k_values=[1, 3],
        embedder_batch_size=4,
    )
    runner = TextRetrievalEvalRunner(args)
    out = runner.run()
    assert "toy" in out
    assert "NoReranker" in out["toy"] and "Reranked" in out["toy"]
    assert "NDCG@1" in out["toy"]["NoReranker"]
    assert (tmp_path / "out" / "toy_eval_results.md").exists()
    # results were cached
    assert (tmp_path / "out" / "search_results" / "toy_retrieval.json").exists()


def test_recommendation_eval_runner(tmp_path):
    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.evaluation.recommendation.evaluator import RecommenderEvalRunner
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.recommendation import MLPRetriever, RetrieverRunner
    from nexus_tpu.training.reranker.recommendation import MLPRanker, RankerRunner

    cfg = generate_synthetic_recflow(str(tmp_path / "data"), n_days=2, rows_per_day=256, seq_len=4)
    base = dict(num_train_epochs=1, per_device_train_batch_size=8, max_steps=2,
                learning_rate=0.01, logging_steps=10, evaluation_strategy="no",
                metrics=["ndcg", "recall"])
    mcfg = {"embedding_dim": 8, "mlp_layers": [16], "num_neg": 4, "dropout": 0.0, "batch_norm": False}
    RetrieverRunner(mcfg, cfg, TrainingArguments.from_dict(dict(base, output_dir=str(tmp_path / "ret"))),
                    model_class=MLPRetriever).run()
    RankerRunner({"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False},
                 cfg, TrainingArguments.from_dict(dict(base, output_dir=str(tmp_path / "rank"),
                                                       metrics=["auc", "logloss"])),
                 model_class=MLPRanker).run()

    runner = RecommenderEvalRunner(
        cfg, retriever_ckpt_path=str(tmp_path / "ret"), ranker_ckpt_path=str(tmp_path / "rank"),
        eval_batch_size=64,
    )
    out = runner.run()
    assert any(k.startswith("ndcg@") for k in out["retriever"])
    assert "auc" in out["ranker"]


def test_infer_mode_parity_eval(tmp_path):
    """The reference's eval-as-parity-test: the SAME benchmark through the
    normal-jit engine and the AOT engine must produce identical metrics."""
    pytest.importorskip("torch")
    import json as _json

    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "m"
    d.mkdir()
    words = ["the", "dog", "cat", "runs", "sits", "sky", "red", "blue"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=32)).save_pretrained(str(d))

    ds_dir = tmp_path / "data" / "toy"
    ds_dir.mkdir(parents=True)
    docs = {"d1": "the dog runs", "d2": "the cat sits", "d3": "red sky", "d4": "blue sky"}
    with open(ds_dir / "corpus.jsonl", "w") as f:
        for did, text in docs.items():
            f.write(_json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(ds_dir / "queries.jsonl", "w") as f:
        f.write(_json.dumps({"_id": "q1", "text": "dog runs"}) + "\n")
        f.write(_json.dumps({"_id": "q2", "text": "red sky"}) + "\n")
    with open(ds_dir / "qrels.tsv", "w") as f:
        f.write("q1\td1\t1\nq2\td3\t1\n")

    from nexus_tpu.evaluation.text_retrieval.runner import (
        TextRetrievalEvalArguments,
        TextRetrievalEvalRunner,
    )

    results = {}
    for mode in ("normal", "aot"):
        args = TextRetrievalEvalArguments(
            dataset_dir=str(tmp_path / "data"), dataset_names=["toy"],
            eval_output_dir=str(tmp_path / f"out_{mode}"),
            embedder_name_or_path=str(d), embedder_infer_mode=mode,
            search_top_k=4, k_values=[1, 3], embedder_batch_size=4,
        )
        results[mode] = TextRetrievalEvalRunner(args).run()["toy"]["NoReranker"]
    assert results["normal"] == results["aot"], (results["normal"], results["aot"])


def test_data_loader_remote_download_mocked(tmp_path):
    """Remote BEIR-zip acquisition (reference data_loader.py:34-448) with an
    injected transport — no egress in this environment."""
    import io
    import zipfile

    from nexus_tpu.evaluation.text_retrieval.data_loader import (
        TextRetrievalEvalDataLoader,
    )

    def fake_zip():
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("scifact/corpus.jsonl",
                       json.dumps({"_id": "d1", "title": "t", "text": "hello world"}) + "\n")
            z.writestr("scifact/queries.jsonl",
                       json.dumps({"_id": "q1", "text": "hello"}) + "\n")
            z.writestr("scifact/qrels/test.tsv",
                       "query-id\tcorpus-id\tscore\nq1\td1\t1\n")
        return buf.getvalue()

    urls = []

    def transport(url):
        urls.append(url)
        return fake_zip()

    loader = TextRetrievalEvalDataLoader(str(tmp_path), download=True, transport=transport)
    corpus = loader.load_corpus("scifact")
    assert corpus["d1"]["text"] == "hello world"
    assert loader.load_queries("scifact") == {"q1": "hello"}
    assert loader.load_qrels("scifact") == {"q1": {"d1": 1}}
    assert urls == [
        "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets/scifact.zip"
    ]
    # second load hits the extracted cache, no new fetch
    loader.load_corpus("scifact")
    assert len(urls) == 1


def test_airbench_runner_wiring(tmp_path, monkeypatch):
    """AIR-Bench adapter: engines load from config dataclasses, and run()
    hands OUR retriever/reranker to the (stubbed) air_benchmark harness with
    the eval args forwarded — the searcher protocol is the shared one, so the
    stub exercises a real retrieve call too."""
    import sys
    import types

    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFC, BertModel, BertTokenizerFast

    d = tmp_path / "model"
    d.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "dog", "cat", "runs"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    BertModel(HFC(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64)).save_pretrained(str(d))

    from nexus_tpu.evaluation.text_retrieval.airbench import (
        AIRBenchEvalArgs,
        AIRBenchEvalModelArgs,
        AIRBenchEvalRunner,
    )

    eval_args = AIRBenchEvalArgs.from_dict({
        "benchmark_version": "AIR-Bench_24.05",
        "task_types": ["qa"],
        "domains": ["wiki"],
        "languages": ["en"],
        "output_dir": str(tmp_path / "out"),
        "search_top_k": 2,
    })
    model_args = AIRBenchEvalModelArgs.from_dict({
        "embedder_name_or_path": str(d),
        "reranker_name_or_path": str(d),
        "embedder_batch_size": 4,
        "reranker_batch_size": 4,
    })
    runner = AIRBenchEvalRunner(eval_args, model_args)
    assert str(runner.retriever) == "model" and str(runner.reranker) == "model"

    # without the optional package, run() must raise a clear ImportError
    sys.modules.pop("air_benchmark", None)
    with pytest.raises(ImportError, match="air_benchmark"):
        runner.run()

    calls = {}

    class FakeAIRBench:
        def __init__(self, **kw):
            calls["ctor"] = kw

        def run(self, retriever, reranker=None, output_dir=None, overwrite=False):
            calls["run"] = dict(retriever=retriever, reranker=reranker,
                                output_dir=output_dir, overwrite=overwrite)
            # drive the shared searcher protocol the way the harness does
            corpus = {"d1": {"title": "", "text": "dog runs"}, "d2": {"title": "", "text": "cat"}}
            res = retriever(corpus, {"q1": "dog"})
            assert set(res["q1"]) <= {"d1", "d2"}
            rr = reranker(corpus, {"q1": "dog"}, res)
            assert set(rr["q1"]) == set(res["q1"])

    stub = types.ModuleType("air_benchmark")
    stub.AIRBench = FakeAIRBench
    monkeypatch.setitem(sys.modules, "air_benchmark", stub)
    runner.run()
    assert calls["ctor"]["benchmark_version"] == "AIR-Bench_24.05"
    assert calls["ctor"]["task_types"] == ["qa"]
    assert calls["run"]["retriever"] is runner.retriever
    assert calls["run"]["reranker"] is runner.reranker
    assert calls["run"]["output_dir"] == str(tmp_path / "out")
