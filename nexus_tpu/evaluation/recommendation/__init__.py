from nexus_tpu.evaluation.recommendation.evaluator import (  # noqa: F401
    RecommenderAbsEvaluator,
    RecommenderEvalRunner,
    TDERecommenderEvalRunner,
)
