"""Training callbacks (parity: Nexus/training/embedder/recommendation/
callback.py:17-267 and the reranker twin)."""

from __future__ import annotations

import os
import time
from typing import Optional

from nexus_tpu.utils.logging import get_logger, log_dict

logger = get_logger("nexus_tpu.training")


class Callback:
    def on_train_begin(self, trainer):
        pass

    def on_log(self, trainer, logs: dict):
        pass

    def on_step_end(self, trainer, step: int):
        pass

    def on_epoch_end(self, trainer, epoch: int, metrics: Optional[dict] = None):
        pass

    def on_train_end(self, trainer):
        pass


class LoggerCallback(Callback):
    """Console + jsonl history (the WANDB-less observability path: every log
    and eval record lands in <output_dir>/train_log.jsonl)."""

    def _append(self, trainer, record: dict):
        try:
            import json

            os.makedirs(trainer.args.output_dir, exist_ok=True)
            with open(os.path.join(trainer.args.output_dir, "train_log.jsonl"), "a") as f:
                f.write(json.dumps(record) + "\n")
        except Exception:
            pass

    def on_log(self, trainer, logs: dict):
        log_dict(logger, logs, prefix=f"step {logs.get('step', '?')}")
        self._append(trainer, {"event": "log", **logs})

    def on_epoch_end(self, trainer, epoch, metrics=None):
        if metrics:
            log_dict(logger, metrics, prefix=f"eval epoch {epoch}")
            self._append(trainer, {"event": "eval", "epoch": epoch, **metrics})

    def on_train_end(self, trainer):
        if trainer.train_summary:
            self._append(trainer, {"event": "summary", **trainer.train_summary})


class StopCallback(Callback):
    """Stop after max_steps (parity: StopCallback)."""

    def __init__(self, max_steps: Optional[int]):
        self.max_steps = max_steps

    def on_step_end(self, trainer, step):
        if self.max_steps is not None and step >= self.max_steps:
            trainer.should_stop = True


class CheckpointCallback(Callback):
    """Save a checkpoint every `steps` steps into checkpoint-<step>/."""

    def __init__(self, steps: Optional[int], output_dir: str):
        self.steps = steps
        self.output_dir = output_dir

    def on_step_end(self, trainer, step):
        if self.steps and step > 0 and step % self.steps == 0:
            path = os.path.join(self.output_dir, f"checkpoint-{step}")
            trainer.save_model(path)
            logger.info("saved checkpoint at step %d -> %s", step, path)


class EarlyStopCallback(Callback):
    """Metric-monitored early stop with best-checkpoint saving
    (parity: EarlyStopCallback + checkpoint_best_ckpt)."""

    def __init__(
        self,
        metric: str,
        patience: int = 3,
        greater_is_better: bool = True,
        save_best: bool = True,
        output_dir: str = ".",
    ):
        self.metric = metric
        self.patience = patience
        self.sign = 1.0 if greater_is_better else -1.0
        self.save_best = save_best
        self.output_dir = output_dir
        self.best = -float("inf")
        self.bad_epochs = 0

    def on_epoch_end(self, trainer, epoch, metrics=None):
        if not metrics or self.metric not in metrics:
            return
        value = self.sign * float(metrics[self.metric])
        if value > self.best:
            self.best = value
            self.bad_epochs = 0
            if self.save_best:
                path = os.path.join(self.output_dir, "best_ckpt")
                trainer.save_model(path)
                logger.info("new best %s=%.6f; saved %s", self.metric, self.sign * value, path)
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                logger.info("early stop: %s did not improve for %d epochs", self.metric, self.patience)
                trainer.should_stop = True


class ItemVectorCallback(Callback):
    """Refresh the retriever's item-vector cache when saving
    (parity: ItemVectorCallback)."""

    def on_epoch_end(self, trainer, epoch, metrics=None):
        if hasattr(trainer.model, "update_item_vectors"):
            trainer.model.update_item_vectors(trainer.state_variables())


class SamplerRefreshCallback(Callback):
    """Rebuild quantized-sampler codebooks (MIDX/cluster/LSH) from the
    current item vectors between epochs (the reference refreshes sampler
    state alongside item-vector updates). Invalidates the compiled train
    step so the new index is baked into the next epoch's program."""

    def __init__(self, every_n_epochs: int = 1):
        self.every_n_epochs = every_n_epochs

    def on_epoch_end(self, trainer, epoch, metrics=None):
        model = trainer.model
        if not hasattr(model, "update_sampler_index"):
            return
        sampler = getattr(model, "negative_sampler", None)
        if sampler is None or not hasattr(sampler, "update"):
            return
        from nexus_tpu.modules.sampler import PopularSampler, UniformSampler

        if isinstance(sampler, (UniformSampler, PopularSampler)):
            return  # stateless samplers: nothing to rebuild
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        import jax

        model.update_sampler_index(jax.random.PRNGKey(epoch + 1), trainer.state_variables())
        trainer._train_step = None  # re-jit with the refreshed index
        logger.info("sampler index refreshed after epoch %d", epoch)


class ThroughputCallback(Callback):
    """Samples/sec accounting — the train_samples_per_second parity signal."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.start = None
        self.samples = 0

    def on_train_begin(self, trainer):
        self.start = time.perf_counter()
        self.samples = 0

    def on_step_end(self, trainer, step):
        self.samples += self.batch_size

    def on_train_end(self, trainer):
        elapsed = max(time.perf_counter() - self.start, 1e-9)
        tput = self.samples / elapsed
        trainer.train_summary = {
            "train_runtime": elapsed,
            "train_samples": self.samples,
            "train_samples_per_second": tput,
        }
        log_dict(logger, trainer.train_summary, prefix="train summary")
