"""TDE training runners (parity: Nexus/training/embedder/recommendation/
tde_runner.py:18-214 + tde trainer wrap_dataloader).

The runner wraps a normal retriever/ranker runner: every batch passes
through the host-side ID transformer (global id -> cache slot) before the
compiled step, and evicted/admitted embedding rows flow between the device
table and the parameter server. The trainer itself is unchanged — the device
program never sees an unbounded id.
"""

from __future__ import annotations

from typing import Dict, Optional

from nexus_tpu.dynamic_embedding.tde import TDEModel
from nexus_tpu.inference.feature_store import KVStore
from nexus_tpu.training.embedder.recommendation.runner import RetrieverRunner
from nexus_tpu.training.reranker.recommendation.runner import RankerRunner
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.dynamic_embedding.runner")


class _TDERunnerMixin:
    """Wraps dataset iteration with the id transform + row traffic."""

    def _init_tde(self, tde_features: Dict[str, int], ps: Optional[KVStore], use_native: bool):
        self.tde = TDEModel(self.model, tde_features, ps=ps, use_native=use_native)

    def _wrap(self, dataset):
        trainer = self.trainer

        class _Wrapped:
            def __init__(self, inner, tde):
                self.inner = inner
                self.tde = tde

            def set_epoch(self, epoch):
                if hasattr(self.inner, "set_epoch"):
                    self.inner.set_epoch(epoch)

            def __iter__(self):
                for batch in self.inner:
                    state = trainer._state
                    variables = state.variables if state is not None else None
                    new_batch, new_vars = self.tde.transform_batch(batch, variables)
                    if new_vars is not None and state is not None and new_vars is not variables:
                        trainer._state = state.replace(params=new_vars["params"])
                    yield new_batch

        return _Wrapped(dataset, self.tde)

    def run(self, resume_from_checkpoint: Optional[str] = None):
        train_ds, eval_ds = self.load_dataset()
        if self.trainer._state is None:
            self.trainer.init_state()
        # the _Wrapped view is re-iterable and forwards set_epoch, so epoch
        # reshuffling flows through to the underlying ShardedDataset
        state = self.trainer.train(
            self._wrap(train_ds), self._wrap(eval_ds),
            resume_from_checkpoint=resume_from_checkpoint,
        )
        import os

        self.trainer.save_model(self.train_args.output_dir, blocking=True)
        self.tde.tde_save(os.path.join(self.train_args.output_dir, "tde_state.pkl"), state.variables)
        if hasattr(self.tde.ps, "save"):
            # in-process PS: persist spilled rows next to the checkpoint so a
            # later eval/serving process can restore them (redis plays this
            # role in deployment)
            self.tde.ps.save(os.path.join(self.train_args.output_dir, "tde_ps.pkl"))
        logger.info("TDE model + id-transformer state saved to %s", self.train_args.output_dir)
        return state


class TDERetrieverRunner(_TDERunnerMixin, RetrieverRunner):
    def __init__(self, *args, tde_features: Dict[str, int], ps: Optional[KVStore] = None,
                 use_native: bool = True, **kw):
        super().__init__(*args, **kw)
        self._init_tde(tde_features, ps, use_native)


class TDERankerRunner(_TDERunnerMixin, RankerRunner):
    def __init__(self, *args, tde_features: Dict[str, int], ps: Optional[KVStore] = None,
                 use_native: bool = True, **kw):
        super().__init__(*args, **kw)
        self._init_tde(tde_features, ps, use_native)
