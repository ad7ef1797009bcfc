"""Training arguments (parity: Nexus/training/*/recommendation/arguments.py
TrainingArguments + the HF TrainingArguments fields the reference relies on)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from nexus_tpu.config import AbsArguments


@dataclass
class TrainingArguments(AbsArguments):
    output_dir: str = "./saves/ckpt"
    num_train_epochs: int = 1
    max_steps: Optional[int] = None
    per_device_train_batch_size: int = 512
    per_device_eval_batch_size: Optional[int] = None
    gradient_accumulation_steps: int = 1
    train_batch_size: Optional[int] = None  # alias accepted by configs

    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    optimizer: str = "adam"
    lr_scheduler: Optional[str] = None
    warmup_steps: int = 0
    max_grad_norm: Optional[float] = None

    logging_steps: int = 50
    save_steps: Optional[int] = None
    checkpoint_steps: Optional[int] = None
    checkpoint_best_ckpt: bool = True
    evaluation_strategy: str = "epoch"  # 'epoch' | 'steps' | 'no'
    eval_steps: Optional[int] = None

    metrics: List[str] = field(default_factory=lambda: ["auc", "logloss"])
    cutoffs: List[int] = field(default_factory=lambda: [1, 5, 10])
    earlystop_metric: Optional[str] = None
    earlystop_patience: int = 3
    earlystop_greater_is_better: bool = True

    seed: int = 42
    bf16: bool = True  # compute in bfloat16 on the forward where safe
    fast_prng: bool = True  # use the hardware RBG PRNG for dropout (threefry
    # mask generation costs ~30% of a seq-512 encoder forward on TPU)
    # structured profiling: capture a jax profiler trace for steps [a, b)
    # into <output_dir>/profile (open with tensorboard / xprof)
    profile_step_start: Optional[int] = None
    profile_step_end: Optional[int] = None
    item_batch_size: int = 2048
    disable_tqdm: bool = True  # accepted for config parity; no tqdm used
    # spot/maintenance SIGTERM -> finish the step, write a full resume
    # checkpoint + PREEMPTED.json into output_dir, stop cleanly; train()
    # with resume_from_checkpoint=None then auto-resumes from the marker
    # (training/preemption.py). Zero cost until a signal actually arrives.
    preemption_safe: bool = True
    # overlap checkpoint serialization + file writes with training on a
    # background thread (device->host snapshot stays on the train thread;
    # one save in flight, errors re-raised at the next save). The final
    # save at train end and preemption saves are always synchronous.
    async_checkpoint: bool = False

    def __post_init__(self):
        if self.train_batch_size and not self.per_device_train_batch_size:
            self.per_device_train_batch_size = self.train_batch_size
        if self.train_batch_size and self.train_batch_size != 512:
            # explicit train_batch_size in config wins (reference config style)
            self.per_device_train_batch_size = self.train_batch_size
        if self.per_device_eval_batch_size is None:
            self.per_device_eval_batch_size = self.per_device_train_batch_size
        if self.save_steps and not self.checkpoint_steps:
            self.checkpoint_steps = self.save_steps
