from nexus_tpu.training.arguments import TrainingArguments  # noqa: F401
from nexus_tpu.training.trainer import RecTrainer, TrainState  # noqa: F401
