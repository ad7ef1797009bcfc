"""Text retrieval eval runner (parity: Nexus/evaluation/text_retrieval/
runner.py:38-211). `embedder_infer_mode` selects the normal-jit or AOT
engine — running the SAME benchmark through both is the engine-parity test
(the reference's eval-as-test pattern, SURVEY §4.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from nexus_tpu.config import AbsArguments
from nexus_tpu.evaluation.text_retrieval.data_loader import TextRetrievalEvalDataLoader
from nexus_tpu.evaluation.text_retrieval.evaluator import TextRetrievalAbsEvaluator
from nexus_tpu.evaluation.text_retrieval.searcher import (
    TextRetrievalEvalDenseRetriever,
    TextRetrievalEvalReranker,
)
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.runner")


@dataclass
class TextRetrievalEvalArguments(AbsArguments):
    eval_name: str = "text_retrieval"
    dataset_dir: str = None
    dataset_names: List[str] = field(default_factory=list)
    eval_output_dir: str = "./eval_results"
    embedder_name_or_path: str = None
    reranker_name_or_path: Optional[str] = None
    embedder_infer_mode: Optional[str] = None  # None/'normal' | 'aot'/'onnx'/'tensorrt'
    reranker_infer_mode: Optional[str] = None
    search_top_k: int = 1000
    rerank_top_k: int = 100
    embedder_batch_size: int = 256
    embedder_query_max_length: int = 512
    embedder_passage_max_length: int = 512
    k_values: List[int] = field(default_factory=lambda: [1, 3, 5, 10, 100])
    corpus_embd_save_dir: Optional[str] = None
    overwrite: bool = False


class TextRetrievalEvalRunner:
    def __init__(self, args: TextRetrievalEvalArguments):
        self.args = args
        self.data_loader = TextRetrievalEvalDataLoader(args.dataset_dir)
        self.retriever, self.reranker = self.get_models()
        self.evaluator = TextRetrievalAbsEvaluator(
            eval_name=args.eval_name,
            data_loader=self.data_loader,
            eval_output_dir=args.eval_output_dir,
            k_values=tuple(args.k_values),
            overwrite=args.overwrite,
        )

    def get_models(self):
        from nexus_tpu.inference.embedder.text_retrieval import BaseEmbedderInferenceEngine
        from nexus_tpu.inference.reranker.text_retrieval import BaseRerankerInferenceEngine

        mode = self.args.embedder_infer_mode or "normal"
        embedder = BaseEmbedderInferenceEngine(
            model_name_or_path=self.args.embedder_name_or_path,
            infer_mode=mode,
            batch_size=self.args.embedder_batch_size,
            max_length=self.args.embedder_passage_max_length,
        )
        retriever = TextRetrievalEvalDenseRetriever(
            embedder,
            search_top_k=self.args.search_top_k,
            corpus_embd_save_dir=self.args.corpus_embd_save_dir,
        )
        reranker = None
        if self.args.reranker_name_or_path:
            rr_engine = BaseRerankerInferenceEngine(
                model_name_or_path=self.args.reranker_name_or_path,
                infer_mode=self.args.reranker_infer_mode or "normal",
            )
            reranker = TextRetrievalEvalReranker(rr_engine, rerank_top_k=self.args.rerank_top_k)
        return retriever, reranker

    def run(self) -> Dict[str, dict]:
        out = {}
        for name in self.args.dataset_names:
            logger.info("evaluating %s", name)
            out[name] = self.evaluator(self.retriever, self.reranker, dataset_name=name)
        return out
