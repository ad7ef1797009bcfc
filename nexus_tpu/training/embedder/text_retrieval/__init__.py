from nexus_tpu.training.embedder.text_retrieval.arguments import (  # noqa: F401
    TextEmbedderDataArguments,
    TextEmbedderModelArguments,
)
from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel  # noqa: F401
from nexus_tpu.training.embedder.text_retrieval.dataset import (  # noqa: F401
    TextEmbedderCollator,
    TextEmbedderTrainDataset,
)
from nexus_tpu.training.embedder.text_retrieval.runner import TextEmbedderRunner  # noqa: F401
