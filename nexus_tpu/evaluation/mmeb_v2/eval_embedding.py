"""MMEB-v2 embedding evaluation (parity: Nexus/evaluation/mmeb_v2/
eval_embedding.py:26-241 + gather_results/report_score_v2).

Two data paths per task:
- the REAL MMEB-v2 format: local HF save_to_disk annotation trees parsed by
  the 21-parser registry (datasets.py) — used when `data_basedir` is set;
- a simple jsonl fixture format (legacy smoke path) under `dataset_dir`.

Per task: encode queries and the dedup'd candidate pool with a
MultimodalEmbedder (process-sharded with pad-to-divisible, the jax.process
analog of split_dataset_by_node), cache embeddings to disk, score with the
on-device top-k kernel, compute hit/ndcg/map/mrr@k (graded ndcg for the
visdoc qrels), and aggregate a per-modality report table. A reranker engine
can rescore each query's top-k.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Set

import numpy as np

from nexus_tpu.evaluation.mmeb_v2.constant import MMEB_TASKS, get_task_info
from nexus_tpu.evaluation.mmeb_v2.metrics import compute_graded_metrics, compute_task_metrics
from nexus_tpu.ops.topk import brute_force_topk
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.mmeb")


def item_to_normalized(item: dict) -> dict:
    """Parser ITEM {text, image, video, instruction} -> the embedder's
    normalized {text, images, videos} with the instruction applied."""
    text = item.get("text") or ""
    inst = item.get("instruction") or ""
    if inst:
        text = f"{inst} {text}".strip()
    out = {"text": text, "images": [], "videos": [], "pages": []}
    if item.get("image"):
        out["images"] = [item["image"]]
    if item.get("video"):
        out["videos"] = [list(item["video"])]  # pre-sampled frame list
    return out


def _load_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _shard(items: List, rank: int, world: int) -> List:
    """Pad-to-divisible rank sharding (parity: eval_embedding.py:26-37)."""
    if world == 1:
        return items
    per = -(-len(items) // world)
    padded = items + items[: per * world - len(items)]
    return padded[rank * per : (rank + 1) * per]


class MMEBEvaluator:
    def __init__(
        self,
        embedder,
        dataset_dir: Optional[str] = None,
        output_dir: str = "./mmeb_results",
        reranker=None,
        rerank_top_k: int = 10,
        k_values=(1, 5, 10),
        rank: int = 0,
        world_size: int = 1,
        run_id: Optional[str] = None,
        reuse_embeddings: bool = True,
        data_basedir: Optional[str] = None,
        parser_kwargs: Optional[dict] = None,
    ):
        self.embedder = embedder
        self.dataset_dir = dataset_dir
        self.data_basedir = data_basedir
        self.parser_kwargs = dict(parser_kwargs or {})
        self.output_dir = output_dir
        self.reranker = reranker
        self.rerank_top_k = rerank_top_k
        self.k_values = tuple(k_values)
        self.rank = rank
        self.world_size = world_size
        self.run_id = run_id  # optional token scoping the cross-rank gather
        # files: reuse of an output_dir across runs cannot otherwise tell a
        # crashed rank's previous-run file from a fresh one
        self.reuse = reuse_embeddings

    def _rank_file(self, r: int) -> str:
        tag = f"_{self.run_id}" if self.run_id else ""
        return os.path.join(self.output_dir, f"rank{r}{tag}_results.json")

    # -- per-task -----------------------------------------------------------

    def _emb_cache(self, task: str, kind: str) -> str:
        d = os.path.join(self.output_dir, "embeddings")
        os.makedirs(d, exist_ok=True)
        # per-rank files: each rank encodes its own query shard (and that
        # shard's candidate set), so caches must not collide across ranks
        suffix = f"_rank{self.rank}" if self.world_size > 1 else ""
        return os.path.join(d, f"{task}_{kind}{suffix}.npy")

    def _encode_cached(self, task: str, kind: str, items: List) -> np.ndarray:
        path = self._emb_cache(task, kind)
        if self.reuse and os.path.exists(path):
            return np.load(path)
        embs = self.embedder.encode_corpus(items) if kind != "query" else self.embedder.encode_queries(items)
        np.save(path, np.asarray(embs))
        return np.asarray(embs)

    def evaluate_task(self, task_name: str) -> Dict[str, float]:
        """Dispatch: real MMEB-v2 annotation tree when data_basedir is set
        (and the task's local dataset exists), else the jsonl fixture path."""
        get_task_info(task_name)
        if self.data_basedir is not None:
            from nexus_tpu.evaluation.mmeb_v2.constant import task_data_exists

            if task_data_exists(self.data_basedir, task_name):
                return self.evaluate_task_real(task_name)
        return self.evaluate_task_jsonl(task_name)

    def evaluate_task_real(self, task_name: str, **extra_kwargs) -> Dict[str, float]:
        """Real-format task: parser registry -> dedup'd candidate pool ->
        encode -> rank -> (graded) metrics."""
        from nexus_tpu.evaluation.mmeb_v2.datasets import generate_cand_dataset, load_task

        kwargs = {
            "data_basedir": self.data_basedir,
            "image_root": os.path.join(self.data_basedir, "media", task_name),
            "video_root": os.path.join(self.data_basedir, "video", task_name),
            "frame_root": os.path.join(self.data_basedir, "frames", task_name),
            **self.parser_kwargs, **extra_kwargs,
        }
        rows, corpus = load_task(task_name, **kwargs)
        rows = _shard(rows, self.rank, self.world_size)
        cand_items, name_index = generate_cand_dataset(rows, corpus)

        q_items = [item_to_normalized(r["query_input"]) for r in rows]
        q_embs = self._encode_cached(task_name, "query", q_items)
        c_embs = self._encode_cached(
            task_name, "cand", [item_to_normalized(c) for c in cand_items]
        )

        k = min(max(self.k_values) * 10, len(cand_items))
        _, idx = brute_force_topk(q_embs, c_embs, k=k)
        ranked = np.asarray(idx).tolist()

        graded = any("rel_scores" in r["dataset_infos"] for r in rows)
        if self.reranker is not None:
            ranked = self._rerank_items(rows, cand_items, ranked)
        if graded:
            relevance = []
            for r in rows:
                info = r["dataset_infos"]
                names = info["cand_names"]
                scores = info.get("rel_scores") or [1] * len(names)
                relevance.append({
                    name_index[n]: float(s) for n, s in zip(names, scores) if n in name_index
                })
            metrics = compute_graded_metrics(ranked, relevance, self.k_values)
        else:
            relevant = []
            for r in rows:
                label = r["dataset_infos"]["label_name"]
                labels = label if isinstance(label, list) else [label]
                relevant.append({name_index[n] for n in labels if n in name_index})
            metrics = compute_task_metrics(ranked, relevant, self.k_values)
        metrics["_n"] = len(rows)  # shard query count (cross-rank merge weight)
        logger.info("%s (real format, %d queries, %d candidates): %s",
                    task_name, len(rows), len(cand_items), metrics)
        return metrics

    def _rerank_items(self, rows: List[dict], cand_items: List[dict], ranked):
        """Rescoring over parser items: a multimodal reranker (yes-logit VLM,
        inference/reranker/multimodal.py) sees the FULL query/candidate items;
        a text cross-encoder sees their text surface
        (parity: eval_reranker.py rerank_topk_for_queries)."""
        mm = getattr(self.reranker, "multimodal", False)

        def text_of(item):
            return (item.get("text") or "") if isinstance(item, dict) else str(item)

        proj = (lambda x: x) if mm else text_of
        new_ranked = []
        for r, order in zip(rows, ranked):
            top = order[: self.rerank_top_k]
            pairs = [(proj(r["query_input"]), proj(cand_items[c])) for c in top]
            scores = self.reranker.compute_score(pairs, normalize=False)
            reorder = np.argsort(-np.asarray(scores))
            new_ranked.append([top[j] for j in reorder] + list(order[self.rerank_top_k :]))
        return new_ranked

    def evaluate_task_jsonl(self, task_name: str) -> Dict[str, float]:
        records = _load_jsonl(os.path.join(self.dataset_dir, f"{task_name}.jsonl"))
        records = _shard(records, self.rank, self.world_size)
        corpus_path = os.path.join(self.dataset_dir, f"{task_name}_corpus.jsonl")

        queries = [r["query"] for r in records]
        q_embs = self._encode_cached(task_name, "query", queries)

        ranked: List[List[int]] = []
        relevant: List[Set[int]] = []
        if os.path.exists(corpus_path):  # shared-corpus retrieval
            corpus = _load_jsonl(corpus_path)
            c_embs = self._encode_cached(task_name, "corpus", corpus)
            k = min(max(self.k_values) * 10, len(corpus))
            _, idx = brute_force_topk(q_embs, c_embs, k=k)
            idx = np.asarray(idx)
            for i, r in enumerate(records):
                ranked.append(idx[i].tolist())
                relevant.append(set(r["rel_ids"]))
        else:  # per-query candidate pools (classification/vqa style)
            for i, r in enumerate(records):
                cands = r["candidates"]
                c_embs = np.asarray(self.embedder.encode_corpus(cands))
                scores = q_embs[i : i + 1] @ c_embs.T
                order = np.argsort(-scores[0])
                ranked.append(order.tolist())
                gold = r.get("label", 0)
                relevant.append({gold} if isinstance(gold, int) else set(gold))

        if self.reranker is not None:
            ranked = self._rerank(task_name, records, ranked)

        metrics = compute_task_metrics(ranked, relevant, self.k_values)
        logger.info("%s: %s", task_name, metrics)
        return metrics

    def _rerank(self, task_name: str, records: List[dict], ranked: List[List[int]]):
        """Cross-encoder rescoring of each query's top-k
        (parity: eval_reranker.py:56-165). The reranker scores
        (query text, candidate text) pairs."""
        corpus_path = os.path.join(self.dataset_dir, f"{task_name}_corpus.jsonl")
        corpus = _load_jsonl(corpus_path) if os.path.exists(corpus_path) else None

        mm = getattr(self.reranker, "multimodal", False)

        def text_of(item):
            return item if isinstance(item, str) else (item.get("text") or "")

        proj = (lambda x: x) if mm else text_of
        new_ranked = []
        for r, order in zip(records, ranked):
            top = order[: self.rerank_top_k]
            cands = [corpus[c] if corpus is not None else r["candidates"][c] for c in top]
            pairs = [(proj(r["query"]), proj(c)) for c in cands]
            scores = self.reranker.compute_score(pairs, normalize=False)
            reorder = np.argsort(-np.asarray(scores))
            new_ranked.append([top[j] for j in reorder] + order[self.rerank_top_k :])
        return new_ranked

    # -- suite --------------------------------------------------------------

    def run(self, task_names: Optional[List[str]] = None) -> Dict[str, Dict[str, float]]:
        if task_names is None:
            task_names = []
            for t in MMEB_TASKS:
                if self.dataset_dir and os.path.exists(
                    os.path.join(self.dataset_dir, f"{t}.jsonl")
                ):
                    task_names.append(t)
                    continue
                if self.data_basedir is not None:
                    from nexus_tpu.evaluation.mmeb_v2.constant import task_data_exists

                    if task_data_exists(self.data_basedir, t):
                        task_names.append(t)
        import time as _time

        # wall-clock run start: the merge only accepts shard files written
        # after this (minus clock-skew slack), so a previous run's leftover
        # file — e.g. from a rank that crashed before its startup cleanup —
        # times out LOUDLY instead of being merged silently
        self._run_start = _time.time()
        if self.world_size > 1:
            # clear THIS rank's stale result file from any previous run in
            # the same output_dir before the (long) evaluation starts
            os.makedirs(self.output_dir, exist_ok=True)
            stale = self._rank_file(self.rank)
            if os.path.exists(stale):
                os.remove(stale)
        results = {}
        for task in task_names:
            results[task] = self.evaluate_task(task)
        if self.world_size > 1:
            return self._merge_ranks(results)
        self.report(results)
        return results

    def _merge_ranks(self, results: Dict[str, Dict[str, float]], timeout_s: float = 600.0):
        """Cross-rank result merge without a comm backend (parity: the
        reference's dist.gather + rank-0 report, eval_embedding.py
        gather_results): every rank writes its shard metrics (+ query counts)
        to output_dir; rank 0 waits for all files and reports query-weighted
        means. Works for multi-process CPU and multi-host TPU alike."""
        import time as _time

        os.makedirs(self.output_dir, exist_ok=True)
        mine = self._rank_file(self.rank)
        tmp = f"{mine}.tmp"  # atomic publish: peers must never read a
        # partially-written JSON
        with open(tmp, "w") as f:
            json.dump(results, f)
        os.replace(tmp, mine)
        if self.rank != 0:
            return results
        paths = [self._rank_file(r) for r in range(self.world_size)]
        # freshness gate: a shard counts only once its mtime is at or after
        # this run's start minus a slack window covering both clock skew and
        # STAGGERED LAUNCHES (a fast rank may legitimately finish before a
        # late rank 0 starts — its file must not read as stale). Files older
        # than the window (a crashed previous run's leftovers) surface as a
        # TimeoutError naming them, never as silent bad metrics; launches
        # staggered beyond the window should pass a distinct run_id.
        min_mtime = getattr(self, "_run_start", 0.0) - max(60.0, timeout_s)

        def _fresh(p: str) -> bool:
            try:
                return os.path.getmtime(p) >= min_mtime
            except OSError:
                return False

        deadline = _time.time() + timeout_s
        while any(not _fresh(p) for p in paths):
            if _time.time() > deadline:
                missing = [p for p in paths if not os.path.exists(p)]
                stale = [p for p in paths if os.path.exists(p) and not _fresh(p)]
                raise TimeoutError(
                    f"rank results never arrived: missing={missing} "
                    f"stale(previous run, mtime < run start)={stale}"
                )
            _time.sleep(0.2)
        shards = []
        for p in paths:
            with open(p) as f:
                shards.append(json.load(f))
        merged: Dict[str, Dict[str, float]] = {}
        for task in results:
            per = [s[task] for s in shards if task in s]
            total = sum(int(r.get("_n", 1)) for r in per)
            names = {m for r in per for m in r if not m.startswith("_")}
            merged[task] = {
                m: round(sum(r.get(m, 0.0) * r.get("_n", 1) for r in per) / max(total, 1), 5)
                for m in names
            }
            merged[task]["_n"] = total
        self.report(merged)
        return merged

    def report(self, results: Dict[str, Dict[str, float]]) -> str:
        """Aggregate per-modality means + per-task table
        (parity: report_score_v2)."""
        os.makedirs(self.output_dir, exist_ok=True)
        with open(os.path.join(self.output_dir, "mmeb_results.json"), "w") as f:
            json.dump(results, f, indent=2)
        lines = ["# MMEB-v2 results", ""]
        metric_names = sorted({m for r in results.values() for m in r if not m.startswith("_")})
        lines.append("| task | modality | " + " | ".join(metric_names) + " |")
        lines.append("|---" * (len(metric_names) + 2) + "|")
        by_modality: Dict[str, list] = {}
        for task, r in results.items():
            mod = MMEB_TASKS.get(task, {}).get("modality", "?")
            by_modality.setdefault(mod, []).append(r)
            lines.append(
                f"| {task} | {mod} | " + " | ".join(str(r.get(m, "")) for m in metric_names) + " |"
            )
        lines.append("")
        lines.append("| modality | " + " | ".join(metric_names) + " |")
        lines.append("|---" * (len(metric_names) + 1) + "|")
        for mod, rs in by_modality.items():
            means = {m: round(float(np.mean([r.get(m, 0.0) for r in rs])), 5) for m in metric_names}
            lines.append(f"| {mod} (avg of {len(rs)}) | " + " | ".join(str(means[m]) for m in metric_names) + " |")
        path = os.path.join(self.output_dir, "mmeb_results.md")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return path
