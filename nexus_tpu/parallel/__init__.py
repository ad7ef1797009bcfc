from nexus_tpu.parallel.mesh import (  # noqa: F401
    get_default_mesh,
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
    embedding_shardings,
    expert_parallel_shardings,
    tensor_parallel_shardings,
    zero1_shardings,
)
from nexus_tpu.parallel.collectives import gather_with_grad  # noqa: F401
from nexus_tpu.parallel.pipeline import pipeline_layers, stage_shardings  # noqa: F401
from nexus_tpu.parallel.bootstrap import BootstrapError, initialize_distributed  # noqa: F401
