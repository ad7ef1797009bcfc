"""MMEB metrics (parity: Nexus/evaluation/mmeb_v2/utils/eval_utils/
metrics.py:12-130): hit/ndcg/map/mrr@k over ranked candidate indices +
relevant-index sets."""

from __future__ import annotations

from typing import Dict, List, Sequence, Set

import numpy as np


def compute_task_metrics(
    ranked: List[Sequence[int]],
    relevant: List[Set[int]],
    k_values=(1, 5, 10),
) -> Dict[str, float]:
    out: Dict[str, float] = {}
    n = max(len(ranked), 1)
    for k in k_values:
        hit = ndcg = ap = rr = 0.0
        for r, rel in zip(ranked, relevant):
            top = list(r[:k])
            hits = [1.0 if c in rel else 0.0 for c in top]
            hit += 1.0 if any(hits) else 0.0
            denom = np.log2(np.arange(2, len(top) + 2))
            dcg = float(np.sum(np.asarray(hits) / denom))
            ideal = float(np.sum(1.0 / denom[: min(len(rel), k)])) if rel else 0.0
            ndcg += dcg / ideal if ideal > 0 else 0.0
            if any(hits):
                csum = np.cumsum(hits)
                prec = csum / np.arange(1, len(hits) + 1)
                ap += float(np.sum(prec * np.asarray(hits))) / min(len(rel), k)
                rr += 1.0 / (int(np.argmax(np.asarray(hits) > 0)) + 1)
        out[f"hit@{k}"] = round(hit / n, 5)
        out[f"ndcg@{k}"] = round(ndcg / n, 5)
        out[f"map@{k}"] = round(ap / n, 5)
        out[f"mrr@{k}"] = round(rr / n, 5)
    return out


def compute_graded_metrics(
    ranked: List[Sequence[int]],
    relevance: List[Dict[int, float]],  # per query: cand index -> graded score
    k_values=(1, 5, 10),
) -> Dict[str, float]:
    """Graded-relevance variant (the vidore/visrag qrels carry scores):
    ndcg uses 2^rel - 1 gains; hit/map/mrr binarize at rel > 0."""
    out: Dict[str, float] = {}
    n = max(len(ranked), 1)
    for k in k_values:
        hit = ndcg = ap = rr = 0.0
        for r, rel in zip(ranked, relevance):
            top = list(r[:k])
            gains = np.asarray([2.0 ** rel.get(c, 0.0) - 1.0 for c in top])
            hits = (gains > 0).astype(np.float64)
            hit += 1.0 if hits.any() else 0.0
            denom = np.log2(np.arange(2, len(top) + 2))
            dcg = float(np.sum(gains / denom))
            ideal_gains = sorted((2.0 ** s - 1.0 for s in rel.values()), reverse=True)[:k]
            idcg = float(np.sum(np.asarray(ideal_gains) / denom[: len(ideal_gains)]))
            ndcg += dcg / idcg if idcg > 0 else 0.0
            if hits.any():
                csum = np.cumsum(hits)
                prec = csum / np.arange(1, len(hits) + 1)
                n_rel = sum(1 for s in rel.values() if s > 0)
                ap += float(np.sum(prec * hits)) / min(max(n_rel, 1), k)
                rr += 1.0 / (int(np.argmax(hits > 0)) + 1)
        out[f"hit@{k}"] = round(hit / n, 5)
        out[f"ndcg@{k}"] = round(ndcg / n, 5)
        out[f"map@{k}"] = round(ap / n, 5)
        out[f"mrr@{k}"] = round(rr / n, 5)
    return out
