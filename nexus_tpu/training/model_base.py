"""Base wrapper for recommendation models.

A nexus_tpu model = (pure linen net) + (this Python wrapper) carrying the
configs, loss, and checkpoint logic — mirroring the reference's
everything-is-a-module assembly (BaseRanker/BaseRetriever factory methods)
while keeping the compute path purely functional for pjit.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.data.attrs import DataAttr4Model


class RecModelBase:
    model_type = "model"

    def __init__(self, data_config: DataAttr4Model, model_config):
        self.data_config = data_config
        self.model_config = self.load_config(model_config)
        self.net = self.build_net()

    # -- config -----------------------------------------------------------

    @classmethod
    def config_cls(cls):
        raise NotImplementedError

    def load_config(self, config):
        cfg_cls = self.config_cls()
        if isinstance(config, cfg_cls):
            return config
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        if isinstance(config, dict):
            return cfg_cls.from_dict(config)
        raise ValueError(f"config must be a {cfg_cls.__name__}, dict or JSON path, got {type(config)}")

    def build_net(self):
        raise NotImplementedError

    # -- init -------------------------------------------------------------

    def dummy_batch(self, batch_size: int = 2) -> dict:
        """Schema-derived all-zeros batch for shape/param initialization."""
        d = self.data_config
        batch: dict = {}
        for feat in (d.context_features or []) + (d.item_features or []):
            batch[feat] = np.zeros((batch_size,), np.int64)
        for label in d.flabels or []:
            batch[label] = np.zeros((batch_size,), np.int64)
        for seq_name, feats in (d.seq_features or {}).items():
            L = d.seq_lengths[seq_name]
            batch[seq_name] = {f: np.zeros((batch_size, L), np.int64) for f in feats}
        return batch

    def init_variables(self, rng: jax.Array, batch: Optional[dict] = None) -> dict:
        batch = batch if batch is not None else self.dummy_batch()
        return self.net.init({"params": rng, "dropout": rng}, batch)

    def init_variables_shape(self) -> dict:
        """Abstract-eval variable structure (no FLOPs) for checkpoint restore."""
        batch = self.dummy_batch()
        return jax.eval_shape(lambda: self.net.init(jax.random.PRNGKey(0), batch))

    # -- persistence ------------------------------------------------------

    def save(self, checkpoint_dir: str, variables, item_vectors=None, **kw) -> None:
        """``item_vectors``: explicit snapshot (async checkpointing passes
        one taken on the training thread); defaults to the live attribute."""
        from nexus_tpu.training.checkpoint import save_checkpoint

        if item_vectors is None:
            item_vectors = getattr(self, "item_vectors", None)
        save_checkpoint(checkpoint_dir, self, variables, item_vectors=item_vectors)

    @classmethod
    def from_pretrained(cls, checkpoint_dir: str, model_class_or_name=None):
        from nexus_tpu.training.checkpoint import load_checkpoint

        return load_checkpoint(checkpoint_dir, model_class_or_name or cls)

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def stack_labels(batch: dict, flabels) -> jnp.ndarray:
        if isinstance(flabels, str):
            return batch[flabels].astype(jnp.float32)
        if len(flabels) == 1:
            return batch[flabels[0]].astype(jnp.float32)
        return jnp.stack([batch[l].astype(jnp.float32) for l in flabels], axis=1)
