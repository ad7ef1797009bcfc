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
from nexus_tpu.inference.embedder.multimodal import MultimodalEmbedder  # noqa: F401
from nexus_tpu.inference.index import (  # noqa: F401
    HostTieredIVFIndex,
    ItemIndex,
    ShardedIVFIndex,
    TieredShardedIVFIndex,
    gen_i2i_index,
    gen_item_index,
)
from nexus_tpu.inference.feature_store import (  # noqa: F401
    FeatureCache,
    FeatureCodec,
    MemoryKVStore,
    get_kv_store,
)
