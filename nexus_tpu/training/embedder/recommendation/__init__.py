from nexus_tpu.training.embedder.recommendation.arguments import ModelArguments  # noqa: F401
from nexus_tpu.training.embedder.recommendation.modeling import (  # noqa: F401
    BaseRetriever,
    DSSMInBatchRetriever,
    DSSMRetriever,
    MLPRetriever,
    SASRecRetriever,
)
from nexus_tpu.training.embedder.recommendation.runner import RetrieverRunner  # noqa: F401
