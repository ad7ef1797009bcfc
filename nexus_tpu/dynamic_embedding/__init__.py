from nexus_tpu.dynamic_embedding.id_transformer import (  # noqa: F401
    IDTransformer,
    IDTransformerGroup,
)
from nexus_tpu.dynamic_embedding.tde import TDEModel, wrap_dataloader  # noqa: F401
