"""Text IR evaluator (parity: Nexus/evaluation/text_retrieval/
evaluator.py:103-492): retrieve -> cache results -> optional rerank ->
metrics -> JSON + markdown leaderboard.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

from nexus_tpu.evaluation.ir_metrics import evaluate_ir_metrics, mrr_at_k
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.text_retrieval")


class TextRetrievalAbsEvaluator:
    def __init__(
        self,
        eval_name: str = "eval",
        data_loader=None,
        eval_output_dir: str = "./eval_results",
        k_values: Tuple[int, ...] = (1, 3, 5, 10, 100),
        overwrite: bool = False,
    ):
        self.eval_name = eval_name
        self.data_loader = data_loader
        self.eval_output_dir = eval_output_dir
        self.k_values = k_values
        self.overwrite = overwrite

    # -- search-result caching (parity: evaluator.py save/load JSONs) -------

    def _results_path(self, dataset_name: str, stage: str) -> str:
        return os.path.join(
            self.eval_output_dir, "search_results", f"{dataset_name}_{stage}.json"
        )

    def save_results(self, path: str, results: dict) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(results, f)

    def load_results(self, path: str) -> Optional[dict]:
        if os.path.exists(path) and not self.overwrite:
            with open(path) as f:
                return json.load(f)
        return None

    # -- main ---------------------------------------------------------------

    def __call__(
        self,
        retriever,
        reranker=None,
        dataset_name: str = "dataset",
        corpus: Dict[str, dict] = None,
        queries: Dict[str, str] = None,
        qrels: Dict[str, Dict[str, int]] = None,
    ) -> Dict[str, dict]:
        if corpus is None:
            corpus = self.data_loader.load_corpus(dataset_name)
            queries = self.data_loader.load_queries(dataset_name)
            qrels = self.data_loader.load_qrels(dataset_name)

        retrieve_path = self._results_path(dataset_name, "retrieval")
        search_results = self.load_results(retrieve_path)
        if search_results is None:
            search_results = retriever(corpus, queries)
            self.save_results(retrieve_path, search_results)

        all_metrics: Dict[str, dict] = {}
        all_metrics["NoReranker"] = self.compute_metrics(qrels, search_results)
        if reranker is not None:
            rerank_path = self._results_path(dataset_name, "rerank")
            rerank_results = self.load_results(rerank_path)
            if rerank_results is None:
                rerank_results = reranker(corpus, queries, search_results)
                self.save_results(rerank_path, rerank_results)
            all_metrics["Reranked"] = self.compute_metrics(qrels, rerank_results)

        self.output_eval_results_to_json(dataset_name, all_metrics)
        self.output_eval_results_to_markdown(dataset_name, all_metrics)
        return all_metrics

    def compute_metrics(self, qrels, results) -> dict:
        ndcg, _map, recall, precision = evaluate_ir_metrics(qrels, results, self.k_values)
        mrr = mrr_at_k(qrels, results, self.k_values)
        return {**ndcg, **_map, **recall, **precision, **mrr}

    # -- reporting ----------------------------------------------------------

    def output_eval_results_to_json(self, dataset_name: str, metrics: dict) -> str:
        path = os.path.join(self.eval_output_dir, f"{dataset_name}_eval_results.json")
        os.makedirs(self.eval_output_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(metrics, f, indent=2)
        return path

    def output_eval_results_to_markdown(self, dataset_name: str, metrics: dict) -> str:
        path = os.path.join(self.eval_output_dir, f"{dataset_name}_eval_results.md")
        os.makedirs(self.eval_output_dir, exist_ok=True)
        rows = sorted({k for m in metrics.values() for k in m})
        lines = [f"# {self.eval_name}: {dataset_name}", ""]
        header = "| metric | " + " | ".join(metrics.keys()) + " |"
        sep = "|---" * (len(metrics) + 1) + "|"
        lines += [header, sep]
        for r in rows:
            lines.append(
                "| " + r + " | " + " | ".join(f"{m.get(r, '')}" for m in metrics.values()) + " |"
            )
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return path
