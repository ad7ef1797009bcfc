from nexus_tpu.utils.registry import Registry, get_model_cls, register_model  # noqa: F401
from nexus_tpu.utils.pytree import batch_to_device, split_batch, tree_stack  # noqa: F401
from nexus_tpu.utils.logging import get_logger, log_dict  # noqa: F401
