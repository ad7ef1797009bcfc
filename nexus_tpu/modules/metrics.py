"""Training/eval metrics (parity: Nexus/modules/metrics.py:18-294).

Conventions follow the reference:
- retriever (top-k) metrics take ``pred`` [B, K] — boolean hit flags for the
  top-K ranked items — and ``target`` [B, T] ground-truth relevance,
- ranker (pointwise) metrics take raw scores + labels.

All are pure jnp functions returning scalar f32, jit-safe (no host syncs).
"""

from __future__ import annotations

from typing import Callable, List, Tuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# ------------------------------- top-k metrics ------------------------------

def recall(pred: Array, target: Array, k: int) -> Array:
    count = jnp.maximum(jnp.sum(target > 0, axis=-1), 1)
    return jnp.mean(jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / count)


def precision(pred: Array, target: Array, k: int) -> Array:
    return jnp.mean(jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / k)


def f1(pred: Array, target: Array, k: int) -> Array:
    count = jnp.sum(target > 0, axis=-1)
    return jnp.mean(2.0 * jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / (count + k))


def map_(pred: Array, target: Array, k: int) -> Array:
    count = jnp.sum(target > 0, axis=-1)
    p = pred[:, :k].astype(jnp.float32)
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)
    prec_at_i = jnp.cumsum(p, axis=-1) / ranks
    ap = jnp.sum(prec_at_i * p, axis=-1) / jnp.maximum(jnp.minimum(count, k), 1)
    return jnp.mean(ap)


def _dcg(rel: Array, k: int) -> Array:
    k = min(k, rel.shape[1])
    denom = jnp.log2(jnp.arange(k, dtype=jnp.float32) + 2.0)[None, :]
    return jnp.sum(rel[:, :k] / denom, axis=-1)


def ndcg(pred: Array, target: Array, k: int) -> Array:
    pred_dcg = _dcg(pred.astype(jnp.float32), k)
    ideal_rel = jnp.sort((target > 0).astype(jnp.float32), axis=-1)[:, ::-1]
    ideal_dcg = _dcg(ideal_rel, k)
    has_rel = jnp.any(target > 0, axis=-1)
    out = jnp.where(has_rel, pred_dcg / jnp.maximum(ideal_dcg, 1e-12), 0.0)
    return jnp.mean(out)


def mrr(pred: Array, target: Array, k: int) -> Array:
    p = pred[:, :k]
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]
    first_hit_rank = jnp.min(jnp.where(p, ranks, jnp.inf), axis=-1)
    rr = jnp.where(jnp.isfinite(first_hit_rank), 1.0 / first_hit_rank, 0.0)
    return jnp.mean(rr)


def hits(pred: Array, target: Array, k: int) -> Array:
    return jnp.mean(jnp.any(pred[:, :k], axis=-1).astype(jnp.float32))


# ------------------------------ pointwise metrics ---------------------------

def logloss(pred: Array, target: Array) -> Array:
    if pred.ndim == target.ndim:
        x, y = pred, target.astype(jnp.float32)
        return jnp.mean(jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x))))
    logp = jax.nn.log_softmax(pred, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


def auc(pred: Array, target: Array) -> Array:
    """Global binary AUC via the rank-statistic (Mann-Whitney U) formulation.

    Tie-aware through average ranks; O(N log N), fully on-device — the jit-safe
    replacement for torchmetrics.auroc.
    """
    pred = pred.reshape(-1).astype(jnp.float32)
    target = (target.reshape(-1) > 0).astype(jnp.float32)
    order = jnp.argsort(pred)
    sorted_pred = pred[order]
    n = pred.shape[0]
    ranks_sorted = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average ranks for ties: group by equal score, assign mean rank
    # segment boundaries where value changes
    new_group = jnp.concatenate([jnp.array([True]), sorted_pred[1:] != sorted_pred[:-1]])
    group_id = jnp.cumsum(new_group) - 1
    group_sum = jax.ops.segment_sum(ranks_sorted, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(ranks_sorted), group_id, num_segments=n)
    avg_rank_sorted = (group_sum / jnp.maximum(group_cnt, 1))[group_id]
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg_rank_sorted)
    n_pos = jnp.sum(target)
    n_neg = n - n_pos
    sum_pos_ranks = jnp.sum(ranks * target)
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    return jnp.where((n_pos > 0) & (n_neg > 0), u / jnp.maximum(n_pos * n_neg, 1.0), 0.5)


def accuracy(pred: Array, target: Array, thres: float = 0.5) -> Array:
    return jnp.mean(((pred > thres).astype(jnp.int32) == (target > 0).astype(jnp.int32)).astype(jnp.float32))


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def mae(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


metric_dict = {
    "ndcg": ndcg,
    "precision": precision,
    "recall": recall,
    "map": map_,
    "hit": hits,
    "mrr": mrr,
    "f1": f1,
    "mse": mse,
    "mae": mae,
    "auc": auc,
    "logloss": logloss,
    "accuracy": accuracy,
}

_TOPK_METRICS = {"ndcg", "precision", "recall", "map", "mrr", "hit", "f1"}
_PRED_METRICS = {"mae", "mse", "auc", "logloss", "accuracy"}
_GLOBAL_METRICS = {"auc"}


def get_retriever_metrics(metric) -> List[Tuple[str, Callable]]:
    names = metric if isinstance(metric, list) else [metric]
    return [(m, metric_dict[m]) for m in names if m in _TOPK_METRICS and m in metric_dict]


def get_ranker_metrics(metric) -> List[Tuple[str, Callable]]:
    names = metric if isinstance(metric, list) else [metric]
    return [(m, metric_dict[m]) for m in names if m in _PRED_METRICS and m in metric_dict]


def get_global_metrics(metric) -> List[Tuple[str, Callable]]:
    names = metric if isinstance(metric, (list, dict)) else [metric]
    return [(m, metric_dict[m]) for m in names if m in _GLOBAL_METRICS and m in metric_dict]


def get_eval_metrics(metric_names: Union[List[str], str], model_type: str) -> List[Tuple[str, Callable]]:
    names = metric_names if isinstance(metric_names, list) else [metric_names]
    if model_type == "retriever":
        return get_retriever_metrics(names)
    return get_ranker_metrics(names)
