"""Dense retriever + reranker searchers for text IR evaluation
(parity: Nexus/evaluation/text_retrieval/searcher.py:75-190).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from nexus_tpu.inference.index import ItemIndex
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.searcher")


class TextRetrievalEvalDenseRetriever:
    """Encode corpus + queries with an embedder engine, search top-k with the
    on-device brute-force index (replaces the Faiss Flat GPU clone,
    evaluation/text_retrieval/utils.py:148-229)."""

    def __init__(self, embedder, search_top_k: int = 1000, corpus_embd_save_dir: Optional[str] = None,
                 name: Optional[str] = None):
        self.embedder = embedder
        self.search_top_k = search_top_k
        self.corpus_embd_save_dir = corpus_embd_save_dir
        self.name = name

    def __str__(self):
        # harness output dirs are named str(retriever) (AIR-Bench convention)
        return os.path.basename(str(self.name)) if self.name else self.__class__.__name__

    def __call__(
        self,
        corpus: Dict[str, dict],
        queries: Dict[str, str],
        corpus_embd_name: str = "doc.npy",
        **kw,
    ) -> Dict[str, Dict[str, float]]:
        doc_ids = list(corpus.keys())
        texts = [
            (corpus[d].get("title", "") + " " + corpus[d]["text"]).strip()
            if isinstance(corpus[d], dict)
            else corpus[d]
            for d in doc_ids
        ]
        emb_path = (
            os.path.join(self.corpus_embd_save_dir, corpus_embd_name)
            if self.corpus_embd_save_dir
            else None
        )
        if emb_path and os.path.exists(emb_path):
            doc_embs = np.load(emb_path)
            logger.info("loaded cached corpus embeddings from %s", emb_path)
        else:
            doc_embs = np.asarray(self.embedder.encode_corpus(texts))
            if emb_path:
                os.makedirs(self.corpus_embd_save_dir, exist_ok=True)
                np.save(emb_path, doc_embs)
        index = ItemIndex.build(doc_embs, index_type="flat")

        qids = list(queries.keys())
        q_embs = np.asarray(self.embedder.encode_queries([queries[q] for q in qids]))
        k = min(self.search_top_k, len(doc_ids))
        scores, rows = index.search(q_embs, k)
        results: Dict[str, Dict[str, float]] = {}
        for i, qid in enumerate(qids):
            results[qid] = {
                doc_ids[int(r)]: float(s) for s, r in zip(scores[i], rows[i])
            }
        return results


class TextRetrievalEvalReranker:
    """Rescore each query's top-k with a cross-encoder
    (parity: searcher.py:164-190)."""

    def __init__(self, reranker, rerank_top_k: int = 100, name: Optional[str] = None):
        self.reranker = reranker
        self.rerank_top_k = rerank_top_k
        self.name = name

    def __str__(self):
        return os.path.basename(str(self.name)) if self.name else self.__class__.__name__

    def __call__(
        self,
        corpus: Dict[str, dict],
        queries: Dict[str, str],
        search_results: Dict[str, Dict[str, float]],
        **kw,
    ) -> Dict[str, Dict[str, float]]:
        pairs, keys = [], []
        for qid, docs in search_results.items():
            top = sorted(docs.items(), key=lambda kv: -kv[1])[: self.rerank_top_k]
            for did, _ in top:
                text = corpus[did]
                if isinstance(text, dict):
                    text = (text.get("title", "") + " " + text["text"]).strip()
                pairs.append((queries[qid], text))
                keys.append((qid, did))
        scores = self.reranker.compute_score(pairs, normalize=False)
        out: Dict[str, Dict[str, float]] = {qid: {} for qid in search_results}
        for (qid, did), s in zip(keys, scores):
            out[qid][did] = float(s)
        return out
