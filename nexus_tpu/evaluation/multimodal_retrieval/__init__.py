from nexus_tpu.evaluation.multimodal_retrieval.runner import (  # noqa: F401
    MultimodalRetrievalEvalRunner,
)
