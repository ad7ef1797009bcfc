"""TDE serving engines (parity: Nexus/inference/{embedder,reranker}/
recommendation/tde_infer_engine.py): recommendation engines whose id
features pass through the (restored) ID transformer before the compiled
forward — serving with unbounded vocabularies.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from nexus_tpu.dynamic_embedding.tde import TDEModel
from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
from nexus_tpu.inference.reranker.recommendation import BaseRerankerInferenceEngine
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.tde")


class _TDEEngineMixin:
    """Wraps feature hydration with the id->slot transform."""

    def _init_tde(self, config: dict):
        tde_features: Dict[str, int] = config["tde_features"]
        ps_path = config.get("tde_ps_path") or os.path.join(
            config["model_ckpt_path"], "tde_ps.pkl"
        )
        if os.path.exists(ps_path):
            # offline deployments: the training run persisted its in-process
            # PS (spilled rows) next to the checkpoint; merge into the
            # serving store (redis holds these keys in deployment)
            from nexus_tpu.inference.feature_store import MemoryKVStore

            spilled = MemoryKVStore.load(ps_path)
            for k in spilled.keys("tde:*"):
                if self.kv.get(k) is None:
                    self.kv.set(k, spilled.get(k))
            logger.info("restored TDE parameter-server rows from %s", ps_path)
        self.tde = TDEModel(self.model, tde_features, ps=self.kv, use_native=True)
        state_path = config.get("tde_state_path") or os.path.join(
            config["model_ckpt_path"], "tde_state.pkl"
        )
        if os.path.exists(state_path):
            self.variables = self.tde.tde_load(state_path, self.variables)
            logger.info("restored TDE transformer state from %s", state_path)

    def _transform(self, batch: dict) -> dict:
        new_batch, new_vars = self.tde.transform_batch(batch, self.variables)
        if new_vars is not None:
            self.variables = new_vars
        return new_batch


class TDEEmbedderInferenceEngine(_TDEEngineMixin, BaseEmbedderInferenceEngine):
    def __init__(self, config: dict, kv_store=None, item_index=None):
        super().__init__(config, kv_store=kv_store, item_index=item_index)
        self._init_tde(config)

    def get_user_context_features(self, user_ids: List):
        batch = super().get_user_context_features(user_ids)
        if self.retrieve_mode == "i2i":
            # i2i reads GLOBAL trigger ids from the behavior sequence and
            # never touches an embedding table — the id->slot transform
            # would corrupt the neighbor-list keys
            return batch
        return self._transform(batch)


class TDERerankerInferenceEngine(_TDEEngineMixin, BaseRerankerInferenceEngine):
    def __init__(self, config: dict, kv_store=None):
        super().__init__(config, kv_store=kv_store)
        self._init_tde(config)

    def batch_inference(self, user_ids: List, candidates):
        context = self._hydrate_user(user_ids)
        context = self._transform(context)
        if not isinstance(candidates, dict):
            candidates = self.get_candidates_features(np.asarray(candidates))
        fiid = self.data_attr.fiid
        # output ids must stay GLOBAL: capture them before the id->slot
        # transform rewrites the candidate id column for the compiled forward
        cand_ids = np.asarray(candidates[fiid]).copy()
        candidates = self._transform(candidates)
        import time

        t0 = time.perf_counter()
        topk_idx = np.asarray(
            self.model.predict(self.variables, context, candidates, topk=self.output_topk)
        )
        self._tick("model", time.perf_counter() - t0)
        item_ids = np.take_along_axis(cand_ids, topk_idx, axis=1)
        return {"user_id": np.asarray(user_ids), "item_ids": item_ids, "topk_idx": topk_idx}
