"""Retriever training runner (parity: Nexus/training/embedder/recommendation/
runner.py:11-92)."""

from __future__ import annotations

from typing import Optional, Type, Union

import jax

from nexus_tpu.data.dataset import ItemDataset, ShardedDataset, compute_item_popularity
from nexus_tpu.data.processor import ConfigProcessor, DataArguments
from nexus_tpu.parallel.mesh import DATA_AXIS, get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.embedder.recommendation.modeling import BaseRetriever, MLPRetriever
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.runner.retriever")


class RetrieverRunner:
    def __init__(
        self,
        model_config_or_path,
        data_config_or_path: Union[dict, str, DataArguments],
        train_config_or_path: Union[dict, str, TrainingArguments],
        model_class: Type[BaseRetriever] = MLPRetriever,
        mesh=None,
    ):
        self.mesh = mesh or get_default_mesh()
        self.train_args = (
            train_config_or_path
            if isinstance(train_config_or_path, TrainingArguments)
            else (
                TrainingArguments.from_dict(train_config_or_path)
                if isinstance(train_config_or_path, dict)
                else TrainingArguments.from_file(train_config_or_path)
            )
        )
        self.processor = ConfigProcessor(data_config_or_path)
        self.train_data_args, self.eval_data_args = self.processor.split_config()
        self.data_attr = self.train_data_args.to_attr()
        self.model = model_class(self.data_attr, model_config_or_path)

        # item dataset: dense feature table + popularity for IPS losses;
        # precomputed counts load from item_pop_dict_path when provided
        # (reference DataArguments field), else one scan of the train files
        self.item_dataset = ItemDataset(self.train_data_args)
        if self.train_data_args.item_pop_dict_path:
            import json

            with open(self.train_data_args.item_pop_dict_path) as f:
                self.item_dataset.item_pop_dict = {int(k): int(v) for k, v in json.load(f).items()}
        else:
            self.item_dataset.item_pop_dict = compute_item_popularity(
                ShardedDataset(self.train_data_args, batch_size=1), self.data_attr.fiid
            )
        self.model.set_item_dataset(self.item_dataset)
        self.trainer = RecTrainer(self.model, self.train_args, mesh=self.mesh)

    def _rank_info(self):
        return jax.process_index(), jax.process_count()

    def load_dataset(self):
        rank, world = self._rank_info()
        bs = self.train_args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS] // world
        train = ShardedDataset(
            self.train_data_args, batch_size=bs, rank=rank, world_size=world,
            shuffle=True, drop_last=True, seed=self.train_args.seed,
        )
        evals = ShardedDataset(
            self.eval_data_args, batch_size=bs, rank=rank, world_size=world,
            shuffle=False, drop_last=False,
        )
        return train, evals

    def run(self, resume_from_checkpoint: Optional[str] = None):
        train_ds, eval_ds = self.load_dataset()
        # pass the re-iterable datasets themselves (NOT a lambda over iter()):
        # the trainer calls set_epoch on them so each epoch reshuffles
        state = self.trainer.train(
            train_ds, eval_ds, resume_from_checkpoint=resume_from_checkpoint,
        )
        # refresh + persist item vectors alongside the checkpoint
        self.model.update_item_vectors(state.variables)
        self.trainer.save_model(self.train_args.output_dir, blocking=True)
        logger.info("model + item vectors saved to %s", self.train_args.output_dir)
        return state
