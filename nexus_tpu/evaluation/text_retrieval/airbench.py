"""AIR-Bench evaluation adapter (parity: Nexus/evaluation/text_retrieval/
airbench/{arguments,runner,__main__}.py).

The reference wraps the external ``air_benchmark`` harness: it builds the
same dense retriever / reranker pair the BEIR-style evaluator uses and hands
them to ``AIRBench.run`` — the benchmark package drives dataset download,
search-result serialization, and leaderboard formatting. We keep the exact
same split: everything model-side (engines, searchers, instructions, infer
modes) is ours; ``air_benchmark`` stays an optional dependency imported only
inside :meth:`AIRBenchEvalRunner.run`, so configs parse and models load on
machines without it (the reference hard-imports it at module scope — ours is
deliberately lazier because the package is absent in zero-egress
environments).

Unlike the reference (which takes ``EvalArgs`` from ``air_benchmark``), the
eval arguments are a local dataclass with the same field names: config files
written for the reference load unchanged, and we forward the fields to the
``AIRBench`` constructor as keywords.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from nexus_tpu.config import AbsArguments
from nexus_tpu.evaluation.text_retrieval.searcher import (
    TextRetrievalEvalDenseRetriever,
    TextRetrievalEvalReranker,
)
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.airbench")


@dataclass
class AIRBenchEvalArgs(AbsArguments):
    """Mirrors ``air_benchmark.EvalArgs`` (the fields the reference forwards,
    airbench/runner.py:52-66)."""

    benchmark_version: Optional[str] = None  # e.g. "AIR-Bench_24.05"
    task_types: Optional[List[str]] = None  # ["qa", "long-doc"]
    domains: Optional[List[str]] = None  # ["arxiv", "finance", ...]
    languages: Optional[List[str]] = None  # ["en", "zh", ...]
    splits: Optional[List[str]] = None  # ["dev", "test"]
    cache_dir: Optional[str] = None
    output_dir: str = "./airbench_results"
    search_top_k: int = 1000
    rerank_top_k: int = 100
    overwrite: bool = False


@dataclass
class AIRBenchEvalModelArgs(AbsArguments):
    """Model-side knobs (subset of the reference's AIRBenchEvalModelArgs that
    maps onto the TPU engines; TensorRT/ONNX path selectors become the AOT
    engine via ``*_infer_mode``)."""

    embedder_name_or_path: str = None
    reranker_name_or_path: Optional[str] = None
    embedder_infer_mode: Optional[str] = None  # None/'normal' | 'aot'/'onnx'/'tensorrt'
    reranker_infer_mode: Optional[str] = None
    embedder_batch_size: int = 256
    reranker_batch_size: int = 256
    embedder_query_max_length: int = 512
    embedder_passage_max_length: int = 512
    reranker_max_length: int = 512
    query_instruction_for_retrieval: Optional[str] = None
    model_cache_dir: Optional[str] = None


class AIRBenchEvalRunner:
    """Build the engine-backed retriever/reranker and run AIR-Bench over them.

    The retriever/reranker classes are the SAME ones the BEIR-style evaluator
    uses (searcher.py) — AIR-Bench calls them with the identical
    ``(corpus, queries)`` / ``(corpus, queries, search_results)`` protocol, so
    one searcher implementation serves both harnesses (the reference shares
    them the same way, airbench/runner.py:33-47).
    """

    def __init__(self, eval_args: AIRBenchEvalArgs, model_args: AIRBenchEvalModelArgs):
        self.eval_args = eval_args
        self.model_args = model_args
        self.retriever, self.reranker = self.load_retriever_and_reranker()

    def load_retriever_and_reranker(self):
        from nexus_tpu.inference.embedder.text_retrieval import BaseEmbedderInferenceEngine
        from nexus_tpu.inference.reranker.text_retrieval import BaseRerankerInferenceEngine

        m = self.model_args
        embedder = BaseEmbedderInferenceEngine(
            model_name_or_path=m.embedder_name_or_path,
            infer_mode=m.embedder_infer_mode or "normal",
            batch_size=m.embedder_batch_size,
            max_length=m.embedder_passage_max_length,
            query_instruction_for_retrieval=m.query_instruction_for_retrieval,
        )
        retriever = TextRetrievalEvalDenseRetriever(
            embedder,
            search_top_k=self.eval_args.search_top_k,
            name=m.embedder_name_or_path,
        )
        reranker = None
        if m.reranker_name_or_path:
            rr = BaseRerankerInferenceEngine(
                model_name_or_path=m.reranker_name_or_path,
                infer_mode=m.reranker_infer_mode or "normal",
                batch_size=m.reranker_batch_size,
                max_length=m.reranker_max_length,
            )
            reranker = TextRetrievalEvalReranker(
                rr, rerank_top_k=self.eval_args.rerank_top_k, name=m.reranker_name_or_path
            )
        return retriever, reranker

    def run(self) -> None:
        try:
            from air_benchmark import AIRBench
        except ImportError as e:  # optional dep, absent in zero-egress envs
            raise ImportError(
                "AIR-Bench evaluation needs the optional `air_benchmark` package "
                "(pip install air-benchmark). Model loading and config parsing "
                "work without it; only `run()` requires the harness."
            ) from e
        evaluation = AIRBench(
            benchmark_version=self.eval_args.benchmark_version,
            task_types=self.eval_args.task_types,
            domains=self.eval_args.domains,
            languages=self.eval_args.languages,
            splits=self.eval_args.splits,
            cache_dir=self.eval_args.cache_dir,
        )
        evaluation.run(
            self.retriever,
            reranker=self.reranker,
            output_dir=self.eval_args.output_dir,
            overwrite=self.eval_args.overwrite,
        )
        logger.info(
            "AIR-Bench search results written to %s — metrics are computed by "
            "the official leaderboard tooling",
            self.eval_args.output_dir,
        )


def main(eval_config_path: str, model_config_path: str) -> None:
    """CLI entry (parity: airbench/__main__.py — config-file driven)."""
    runner = AIRBenchEvalRunner(
        eval_args=AIRBenchEvalArgs.from_json(eval_config_path),
        model_args=AIRBenchEvalModelArgs.from_json(model_config_path),
    )
    runner.run()


def _cli():
    import argparse

    ap = argparse.ArgumentParser(
        description="AIR-Bench eval: python -m nexus_tpu.evaluation."
                    "text_retrieval.airbench --eval_config e.json "
                    "--model_config m.json")
    ap.add_argument("--eval_config", required=True, help="AIRBenchEvalArgs JSON")
    ap.add_argument("--model_config", required=True, help="AIRBenchEvalModelArgs JSON")
    ns = ap.parse_args()
    main(ns.eval_config, ns.model_config)


if __name__ == "__main__":
    _cli()
