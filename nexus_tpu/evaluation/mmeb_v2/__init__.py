from nexus_tpu.evaluation.mmeb_v2.constant import MMEB_TASKS, get_task_info  # noqa: F401
from nexus_tpu.evaluation.mmeb_v2.eval_embedding import MMEBEvaluator  # noqa: F401
