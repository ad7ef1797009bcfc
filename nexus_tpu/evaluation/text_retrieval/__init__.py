from nexus_tpu.evaluation.text_retrieval.airbench import (
    AIRBenchEvalArgs,
    AIRBenchEvalModelArgs,
    AIRBenchEvalRunner,
)
from nexus_tpu.evaluation.text_retrieval.data_loader import TextRetrievalEvalDataLoader
from nexus_tpu.evaluation.text_retrieval.evaluator import TextRetrievalAbsEvaluator
from nexus_tpu.evaluation.text_retrieval.runner import (
    TextRetrievalEvalArguments,
    TextRetrievalEvalRunner,
)
from nexus_tpu.evaluation.text_retrieval.searcher import (
    TextRetrievalEvalDenseRetriever,
    TextRetrievalEvalReranker,
)

__all__ = [
    "AIRBenchEvalArgs",
    "AIRBenchEvalModelArgs",
    "AIRBenchEvalRunner",
    "TextRetrievalEvalDataLoader",
    "TextRetrievalAbsEvaluator",
    "TextRetrievalEvalArguments",
    "TextRetrievalEvalRunner",
    "TextRetrievalEvalDenseRetriever",
    "TextRetrievalEvalReranker",
]
