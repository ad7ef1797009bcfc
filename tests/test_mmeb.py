import json
import os

import numpy as np
import pytest

from nexus_tpu.evaluation.mmeb_v2.metrics import compute_task_metrics


def test_mmeb_metrics_perfect():
    ranked = [[0, 1, 2], [2, 0, 1]]
    relevant = [{0}, {2}]
    m = compute_task_metrics(ranked, relevant, (1, 3))
    assert m["hit@1"] == 1.0 and m["mrr@1"] == 1.0 and m["ndcg@3"] == 1.0


def test_mmeb_metrics_rank2():
    m = compute_task_metrics([[5, 0, 9]], [{0}], (1, 3))
    assert m["hit@1"] == 0.0
    assert m["hit@3"] == 1.0
    assert m["mrr@3"] == 0.5


class _FakeEmbedder:
    """Deterministic embedder: items map to fixed vectors by their text."""

    def __init__(self, dim=8):
        self.dim = dim

    def _vec(self, item):
        text = item if isinstance(item, str) else (item.get("text") or "")
        rng = np.random.default_rng(abs(hash(text)) % (2**32))
        v = rng.normal(size=self.dim)
        return v / np.linalg.norm(v)

    def encode_queries(self, items):
        return np.stack([self._vec(i) for i in items])

    encode_corpus = encode_queries


def test_mmeb_evaluator_end_to_end(tmp_path):
    from nexus_tpu.evaluation.mmeb_v2 import MMEBEvaluator

    ds = tmp_path / "mmeb"
    ds.mkdir()
    # shared-corpus retrieval task: query text == gold doc text -> rank 1
    corpus = [{"text": f"doc {i}"} for i in range(20)]
    with open(ds / "MSCOCO_t2i.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({"query": {"text": f"doc {i}"}, "rel_ids": [i]}) + "\n")
    with open(ds / "MSCOCO_t2i_corpus.jsonl", "w") as f:
        for c in corpus:
            f.write(json.dumps(c) + "\n")
    # candidate-pool classification task
    with open(ds / "ImageNet-1K.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "query": {"text": f"class {i}"},
                "candidates": [{"text": f"class {j}"} for j in range(5)],
                "label": i,
            }) + "\n")

    ev = MMEBEvaluator(_FakeEmbedder(), str(ds), output_dir=str(tmp_path / "out"))
    results = ev.run()
    assert results["MSCOCO_t2i"]["hit@1"] == 1.0  # identical text embeds identically
    assert results["ImageNet-1K"]["hit@1"] == 1.0
    assert os.path.exists(str(tmp_path / "out" / "mmeb_results.md"))
    # embeddings cached
    assert os.path.exists(str(tmp_path / "out" / "embeddings" / "MSCOCO_t2i_corpus.npy"))

    # rank sharding covers all queries across 2 ranks
    ev0 = MMEBEvaluator(_FakeEmbedder(), str(ds), output_dir=str(tmp_path / "o0"),
                        rank=0, world_size=2, reuse_embeddings=False)
    m0 = ev0.evaluate_task("MSCOCO_t2i")
    assert m0["hit@1"] == 1.0


def test_multimodal_retrieval_eval_runner(tmp_path):
    from nexus_tpu.evaluation.multimodal_retrieval import MultimodalRetrievalEvalRunner

    ds = tmp_path / "data" / "toy"
    ds.mkdir(parents=True)
    with open(ds / "corpus.jsonl", "w") as f:
        for i in range(6):
            f.write(json.dumps({"_id": f"d{i}", "text": f"doc number {i}"}) + "\n")
    with open(ds / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q0", "text": "doc number 3"}) + "\n")
    with open(ds / "qrels.tsv", "w") as f:
        f.write("q0\td3\t1\n")

    runner = MultimodalRetrievalEvalRunner(
        _FakeEmbedder(), str(tmp_path / "data"), ["toy"],
        eval_output_dir=str(tmp_path / "out"), k_values=(1, 5),
    )
    out = runner.run()
    assert out["toy"]["NoReranker"]["NDCG@1"] == 1.0


class _FakeReranker:
    """Scores pairs by shared-token count (prefers true matches)."""

    def compute_score(self, pairs, normalize=False):
        return [len(set(q.split()) & set(p.split())) for q, p in pairs]


def test_mmeb_reranker_rescoring(tmp_path):
    from nexus_tpu.evaluation.mmeb_v2 import MMEBEvaluator

    ds = tmp_path / "mmeb"
    ds.mkdir()
    corpus = [{"text": f"topic {i} words"} for i in range(10)]
    with open(ds / "WebQA.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"query": {"text": f"find topic {i}"}, "rel_ids": [i]}) + "\n")
    with open(ds / "WebQA_corpus.jsonl", "w") as f:
        for c in corpus:
            f.write(json.dumps(c) + "\n")

    class _BadEmbedder(_FakeEmbedder):
        """Embeddings carry no signal -> retrieval alone is near-random."""

        def _vec(self, item):
            rng = np.random.default_rng(0)  # same vector for everything
            v = rng.normal(size=self.dim) + 1e-3 * np.random.default_rng(
                abs(hash(str(item))) % (2**32)).normal(size=self.dim)
            return v / np.linalg.norm(v)

    ev = MMEBEvaluator(_BadEmbedder(), str(ds), output_dir=str(tmp_path / "o"),
                       reranker=_FakeReranker(), rerank_top_k=10)
    m = ev.evaluate_task("WebQA")
    # reranker rescues the ranking: gold doc shares its topic number
    assert m["hit@1"] == 1.0
