"""Trec-style IR metrics over qrels + ranked results — the pytrec_eval
replacement (parity: Nexus/evaluation/text_retrieval/utils.py:41-145).

Inputs follow the pytrec_eval convention:
    qrels:   {qid: {docid: relevance_int}}
    results: {qid: {docid: score_float}}
Outputs mirror the reference's evaluate_metrics/evaluate_mrr: per-cutoff
means of ndcg@k / map@k / recall@k / precision@k (+ mrr@k), rounded to 5
decimals like the reference reports.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np


def _ranked_docs(result: Dict[str, float]) -> List[str]:
    return [d for d, _ in sorted(result.items(), key=lambda kv: (-kv[1], kv[0]))]


def _dcg(rels: np.ndarray) -> float:
    if len(rels) == 0:
        return 0.0
    return float(np.sum((2.0**rels - 1.0) / np.log2(np.arange(2, len(rels) + 2))))


def evaluate_ir_metrics(
    qrels: Dict[str, Dict[str, int]],
    results: Dict[str, Dict[str, float]],
    k_values: Tuple[int, ...] = (1, 3, 5, 10, 100, 1000),
) -> Tuple[dict, dict, dict, dict]:
    """Returns (ndcg, map, recall, precision) dicts keyed 'NDCG@k' etc.
    Queries present in qrels but with no relevant docs are skipped, matching
    pytrec_eval's behavior of averaging over judged queries."""
    ndcg = defaultdict(float)
    _map = defaultdict(float)
    recall = defaultdict(float)
    precision = defaultdict(float)
    n_queries = 0
    for qid, rel in qrels.items():
        relevant = {d: r for d, r in rel.items() if r > 0}
        if not relevant:
            continue
        n_queries += 1
        ranked = _ranked_docs(results.get(qid, {}))
        rels = np.array([rel.get(d, 0) for d in ranked], dtype=np.float64)
        n_rel = len(relevant)
        ideal = np.sort(np.array(list(relevant.values()), np.float64))[::-1]
        for k in k_values:
            top = rels[:k]
            # nDCG@k with graded relevance (trec_eval formulation)
            idcg = _dcg(ideal[:k])
            ndcg[f"NDCG@{k}"] += (_dcg(top) / idcg) if idcg > 0 else 0.0
            # binary relevance for map/recall/precision
            hits = (top > 0).astype(np.float64)
            precision[f"P@{k}"] += hits.sum() / k
            recall[f"Recall@{k}"] += hits.sum() / n_rel
            if hits.sum() > 0:
                prec_at_i = np.cumsum(hits) / np.arange(1, len(hits) + 1)
                _map[f"MAP@{k}"] += float(np.sum(prec_at_i * hits)) / min(n_rel, k)
    n = max(n_queries, 1)
    fmt = lambda d: {k: round(float(v) / n, 5) for k, v in d.items()}
    return fmt(ndcg), fmt(_map), fmt(recall), fmt(precision)


def mrr_at_k(
    qrels: Dict[str, Dict[str, int]],
    results: Dict[str, Dict[str, float]],
    k_values: Tuple[int, ...] = (10, 100),
) -> Dict[str, float]:
    out = {}
    for k in k_values:
        total, n = 0.0, 0
        for qid, rel in qrels.items():
            relevant = {d for d, r in rel.items() if r > 0}
            if not relevant:
                continue
            n += 1
            ranked = _ranked_docs(results.get(qid, {}))[:k]
            for rank, d in enumerate(ranked, start=1):
                if d in relevant:
                    total += 1.0 / rank
                    break
        out[f"MRR@{k}"] = round(total / max(n, 1), 5)
    return out
