from nexus_tpu.training.embedder.multimodal_retrieval.modeling import (  # noqa: F401
    BiMultimodalEmbedderModel,
)
from nexus_tpu.training.embedder.multimodal_retrieval.runner import (  # noqa: F401
    MultimodalEmbedderRunner,
)
