"""Recommendation evaluation (parity: Nexus/evaluation/recommendation/
evaluator.py:28-305 + runner.py:41-80): evaluate saved retriever/ranker
checkpoints over the test period of a data config.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


from nexus_tpu.data.dataset import ItemDataset, ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.parallel.mesh import get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.checkpoint import load_checkpoint
from nexus_tpu.training.trainer import RecTrainer
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.recommendation")


class RecommenderAbsEvaluator:
    """Evaluate a loaded model (retriever or ranker) on an eval dataset."""

    def __init__(self, model, variables, eval_args: Optional[TrainingArguments] = None, mesh=None):
        self.model = model
        self.variables = variables
        self.mesh = mesh or get_default_mesh()
        if eval_args is None:
            defaults = (
                ["ndcg", "recall"] if model.model_type == "retriever" else ["auc", "logloss"]
            )
            eval_args = TrainingArguments.from_dict(
                {
                    "output_dir": "/tmp/nexus_eval",
                    "evaluation_strategy": "no",
                    "metrics": list(getattr(model.model_config, "metrics", None) or defaults),
                }
            )
        self.eval_args = eval_args
        self.trainer = RecTrainer(model, self.eval_args, mesh=self.mesh)
        self.trainer.init_state()
        self.trainer._state = self.trainer._state.replace(params=variables["params"])
        if "batch_stats" in variables:
            self.trainer._state = self.trainer._state.replace(batch_stats=variables["batch_stats"])

    def evaluate(self, eval_dataset: ShardedDataset) -> Dict[str, float]:
        return self.trainer.evaluate(lambda: iter(eval_dataset))


class RecommenderEvalRunner:
    """Load retriever and/or ranker checkpoints + eval data; run both
    (parity: RecommenderEvalRunner.run)."""

    def __init__(
        self,
        data_config_or_path,
        retriever_ckpt_path: Optional[str] = None,
        ranker_ckpt_path: Optional[str] = None,
        eval_batch_size: int = 512,
        metrics: Optional[list] = None,
        cutoffs: Optional[list] = None,
        mesh=None,
    ):
        self.mesh = mesh or get_default_mesh()
        processor = ConfigProcessor(data_config_or_path)
        self.train_data_args, self.eval_data_args = processor.split_config()
        self.eval_batch_size = eval_batch_size
        self.metrics = metrics
        self.cutoffs = cutoffs

        self.retriever = self.ranker = None
        if retriever_ckpt_path:
            self.retriever, self.retriever_vars = load_checkpoint(retriever_ckpt_path)
            item_dataset = ItemDataset(self.train_data_args)
            self.retriever.set_item_dataset(item_dataset)
            if self.metrics:
                self.retriever.model_config.metrics = self.metrics
            if self.cutoffs:
                self.retriever.model_config.cutoffs = self.cutoffs
        if ranker_ckpt_path:
            self.ranker, self.ranker_vars = load_checkpoint(ranker_ckpt_path)
            if self.metrics:
                self.ranker.model_config.metrics = self.metrics

    def _eval_dataset(self) -> ShardedDataset:
        return ShardedDataset(
            self.eval_data_args, batch_size=self.eval_batch_size, shuffle=False, drop_last=False
        )

    def run(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        if self.retriever is not None:
            ev = RecommenderAbsEvaluator(self.retriever, self.retriever_vars, mesh=self.mesh)
            out["retriever"] = ev.evaluate(self._eval_dataset())
            logger.info("retriever metrics: %s", out["retriever"])
        if self.ranker is not None:
            ev = RecommenderAbsEvaluator(self.ranker, self.ranker_vars, mesh=self.mesh)
            out["ranker"] = ev.evaluate(self._eval_dataset())
            logger.info("ranker metrics: %s", out["ranker"])
        return out


class _PrecomputedCtxModel:
    """View of a model whose eval_context is pinned to a precomputed value
    (the TDE corpus vectors) — everything else passes through."""

    def __init__(self, model, ctx: dict):
        self._model = model
        self._ctx = ctx

    def __getattr__(self, name):
        return getattr(self._model, name)

    def eval_context(self, variables) -> dict:
        return self._ctx


class TDERecommenderEvalRunner(RecommenderEvalRunner):
    """Standalone eval of checkpoints trained with dynamic embeddings
    (parity: Nexus/evaluation/recommendation/tde_runner.py + __tde_main__.py).

    Every id feature passes through the RESTORED id->slot transformer before
    the compiled step, with embedding rows flowing between the device cache
    table and the parameter server:
    - the retriever corpus is encoded chunk-by-chunk under the transform
      (TDEModel.compute_item_vectors) so vectors stay global-position-indexed
      while the cache only ever holds `capacity` ids;
    - eval batches transform per batch, with row traffic applied to the
      live trainer state (the same wrap the TDE training runner uses).

    ``ps``: the parameter server holding spilled rows — the KV store used in
    training (redis in deployment; a MemoryKVStore.load(...) file offline).
    """

    def __init__(self, data_config_or_path, tde_features: dict, ps=None,
                 use_native: bool = True, **kw):
        super().__init__(data_config_or_path, **kw)
        from nexus_tpu.dynamic_embedding.tde import TDEModel

        self._tde = {}
        for role, model, vars_attr, ckpt in (
            ("retriever", self.retriever, "retriever_vars", kw.get("retriever_ckpt_path")),
            ("ranker", self.ranker, "ranker_vars", kw.get("ranker_ckpt_path")),
        ):
            if model is None:
                continue
            tde = TDEModel(model, tde_features, ps=ps, use_native=use_native)
            state_path = os.path.join(ckpt, "tde_state.pkl")
            if os.path.exists(state_path):
                setattr(self, vars_attr, tde.tde_load(state_path, getattr(self, vars_attr)))
                logger.info("restored TDE transformer state from %s", state_path)
            self._tde[role] = tde

    def _wrap(self, dataset, trainer, tde):
        class _Wrapped:
            def __iter__(self):
                for batch in dataset:
                    state = trainer._state
                    new_batch, new_vars = tde.transform_batch(batch, state.variables)
                    if new_vars is not None and new_vars is not state.variables:
                        trainer._state = state.replace(params=new_vars["params"])
                    yield new_batch

        return _Wrapped()

    def run(self) -> Dict[str, Dict[str, float]]:
        import jax.numpy as jnp

        out: Dict[str, Dict[str, float]] = {}
        if self.retriever is not None:
            tde = self._tde["retriever"]
            vecs, self.retriever_vars = tde.compute_item_vectors(self.retriever_vars)
            ctx = {"item_vectors": jnp.asarray(vecs), "k": max(self.retriever.cutoffs)}
            ev = RecommenderAbsEvaluator(
                _PrecomputedCtxModel(self.retriever, ctx), self.retriever_vars,
                mesh=self.mesh,
            )
            out["retriever"] = ev.evaluate(self._wrap(self._eval_dataset(), ev.trainer, tde))
            logger.info("TDE retriever metrics: %s", out["retriever"])
        if self.ranker is not None:
            tde = self._tde["ranker"]
            ev = RecommenderAbsEvaluator(self.ranker, self.ranker_vars, mesh=self.mesh)
            out["ranker"] = ev.evaluate(self._wrap(self._eval_dataset(), ev.trainer, tde))
            logger.info("TDE ranker metrics: %s", out["ranker"])
        return out
