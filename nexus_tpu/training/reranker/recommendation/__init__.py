from nexus_tpu.training.reranker.recommendation.arguments import ModelArguments  # noqa: F401
from nexus_tpu.training.reranker.recommendation.modeling import (  # noqa: F401
    BaseRanker,
    DCNv2Ranker,
    MLPRanker,
    MMoERanker,
)
from nexus_tpu.training.reranker.recommendation.runner import RankerRunner  # noqa: F401
