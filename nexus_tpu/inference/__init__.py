from nexus_tpu.inference.session import (  # noqa: F401
    AOTSession,
    InferenceSession,
    NormalSession,
    get_inference_session,
)
from nexus_tpu.inference.embedder.text_retrieval import (  # noqa: F401
    BaseEmbedderInferenceEngine,
    TextEmbedder,
)
from nexus_tpu.inference.reranker.text_retrieval import (  # noqa: F401
    BaseRerankerInferenceEngine,
    TextReranker,
)
