"""Multimodal retrieval evaluation (parity: Nexus/evaluation/
multimodal_retrieval/runner.py:1-134): local corpus/queries/qrels jsonl with
media roots, reusing the text-retrieval evaluator machinery with a
MultimodalEmbedder-backed dense retriever.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from nexus_tpu.evaluation.text_retrieval.evaluator import TextRetrievalAbsEvaluator
from nexus_tpu.evaluation.text_retrieval.searcher import TextRetrievalEvalReranker
from nexus_tpu.inference.index import ItemIndex
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.multimodal")


class MultimodalEvalDataLoader:
    """corpus.jsonl entries are multimodal items; queries.jsonl likewise."""

    def __init__(self, dataset_dir: str, media_root: Optional[str] = None):
        self.dataset_dir = dataset_dir
        self.media_root = media_root

    def _load(self, dataset_name: str, fname: str):
        path = os.path.join(self.dataset_dir, dataset_name, fname)
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]

    def load_corpus(self, dataset_name: str) -> Dict[str, dict]:
        return {
            str(r.get("_id", r.get("id", i))): r
            for i, r in enumerate(self._load(dataset_name, "corpus.jsonl"))
        }

    def load_queries(self, dataset_name: str) -> Dict[str, dict]:
        return {
            str(r.get("_id", r.get("id", i))): r
            for i, r in enumerate(self._load(dataset_name, "queries.jsonl"))
        }

    def load_qrels(self, dataset_name: str):
        from nexus_tpu.evaluation.text_retrieval.data_loader import TextRetrievalEvalDataLoader

        return TextRetrievalEvalDataLoader(self.dataset_dir).load_qrels(dataset_name)


class MultimodalDenseRetriever:
    def __init__(self, embedder, search_top_k: int = 100):
        self.embedder = embedder
        self.search_top_k = search_top_k

    def __call__(self, corpus: Dict[str, dict], queries: Dict[str, dict], **kw):
        import numpy as np

        doc_ids = list(corpus.keys())
        doc_embs = np.asarray(self.embedder.encode_corpus([corpus[d] for d in doc_ids]))
        index = ItemIndex.build(doc_embs, index_type="flat")
        qids = list(queries.keys())
        q_embs = np.asarray(self.embedder.encode_queries([queries[q] for q in qids]))
        k = min(self.search_top_k, len(doc_ids))
        scores, rows = index.search(q_embs, k)
        return {
            qid: {doc_ids[int(r)]: float(s) for s, r in zip(scores[i], rows[i])}
            for i, qid in enumerate(qids)
        }


class MultimodalRetrievalEvalRunner:
    def __init__(
        self,
        embedder,
        dataset_dir: str,
        dataset_names: List[str],
        eval_output_dir: str = "./mm_eval_results",
        media_root: Optional[str] = None,
        reranker=None,
        search_top_k: int = 100,
        rerank_top_k: int = 20,
        k_values=(1, 5, 10),
    ):
        self.dataset_names = dataset_names
        self.data_loader = MultimodalEvalDataLoader(dataset_dir, media_root)
        self.retriever = MultimodalDenseRetriever(embedder, search_top_k)
        self.reranker = (
            TextRetrievalEvalReranker(reranker, rerank_top_k) if reranker else None
        )
        self.evaluator = TextRetrievalAbsEvaluator(
            eval_name="multimodal_retrieval",
            data_loader=self.data_loader,
            eval_output_dir=eval_output_dir,
            k_values=tuple(k_values),
        )

    def run(self) -> Dict[str, dict]:
        out = {}
        for name in self.dataset_names:
            corpus = self.data_loader.load_corpus(name)
            queries = self.data_loader.load_queries(name)
            qrels = self.data_loader.load_qrels(name)
            out[name] = self.evaluator(
                self.retriever, self.reranker, dataset_name=name,
                corpus=corpus, queries=queries, qrels=qrels,
            )
        return out
