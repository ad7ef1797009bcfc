"""Ranker training runner (parity: Nexus/training/reranker/recommendation/
runner.py:12-81): config loading -> dataset split -> model -> trainer -> run.
"""

from __future__ import annotations

from typing import Optional, Type, Union

import jax

from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor, DataArguments
from nexus_tpu.parallel.mesh import DATA_AXIS, get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.recommendation.modeling import BaseRanker, MLPRanker
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.runner.ranker")


class RankerRunner:
    def __init__(
        self,
        model_config_or_path: Union[dict, str, object],
        data_config_or_path: Union[dict, str, DataArguments],
        train_config_or_path: Union[dict, str, TrainingArguments],
        model_class: Type[BaseRanker] = MLPRanker,
        mesh=None,
    ):
        self.mesh = mesh or get_default_mesh()
        self.train_args = self._load(TrainingArguments, train_config_or_path)
        self.processor = ConfigProcessor(data_config_or_path)
        self.train_data_args, self.eval_data_args = self.processor.split_config()
        self.data_attr = self.train_data_args.to_attr()
        self.model_class = model_class
        self.model = model_class(self.data_attr, model_config_or_path)
        self.trainer = self.load_trainer()

    @staticmethod
    def _load(cls, cfg):
        if isinstance(cfg, cls):
            return cfg
        if isinstance(cfg, dict):
            return cls.from_dict(cfg)
        return cls.from_file(cfg)

    # per-process sharding: each jax process reads its slice of every file
    def _rank_info(self):
        return jax.process_index(), jax.process_count()

    def load_dataset(self):
        rank, world = self._rank_info()
        train = ShardedDataset(
            self.train_data_args,
            batch_size=self.train_args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS] // world,
            rank=rank, world_size=world, shuffle=True, drop_last=True,
            seed=self.train_args.seed,
        )
        evals = ShardedDataset(
            self.eval_data_args,
            batch_size=self.train_args.per_device_eval_batch_size * self.mesh.shape[DATA_AXIS] // world,
            rank=rank, world_size=world, shuffle=False, drop_last=False,
        )
        return train, evals

    def load_trainer(self) -> RecTrainer:
        return RecTrainer(self.model, self.train_args, mesh=self.mesh)

    def run(self, resume_from_checkpoint: Optional[str] = None):
        train_ds, eval_ds = self.load_dataset()
        # re-iterable datasets passed directly so the trainer's set_epoch
        # reshuffles each epoch (a lambda over iter() would pin epoch 0)
        state = self.trainer.train(
            train_ds, eval_ds, resume_from_checkpoint=resume_from_checkpoint,
        )
        self.trainer.save_model(self.train_args.output_dir, blocking=True)
        logger.info("model saved to %s", self.train_args.output_dir)
        return state
