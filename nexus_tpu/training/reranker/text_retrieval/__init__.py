from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel  # noqa: F401
from nexus_tpu.training.reranker.text_retrieval.dataset import (  # noqa: F401
    TextRerankerCollator,
    TextRerankerTrainDataset,
)
from nexus_tpu.training.reranker.text_retrieval.decoder_only import (  # noqa: F401
    DecoderCrossEncoderModel,
    load_reranker_model,
)
from nexus_tpu.training.reranker.text_retrieval.runner import TextRerankerRunner  # noqa: F401
