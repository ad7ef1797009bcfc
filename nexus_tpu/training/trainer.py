"""The training loop: pjit-compiled steps over a device mesh.

Replaces the reference's HF Trainer + Accelerate + DeepSpeed stack
(Nexus/abc/training/trainer.py:36, SURVEY §2.4) with one substrate:

- ONE compiled train_step: forward + loss + grad + optax update, with the
  batch sharded along the mesh `data` axis and parameters replicated
  (ZeRO-1-style optimizer-state sharding comes from passing
  ``shard_opt_state=True`` — optimizer moments are sharded over the data
  axis, the JAX equivalent of DeepSpeed stage 1; ``shard_tensor_parallel=
  True`` additionally lays the transformer trunk out Megatron-style over a
  `model` mesh axis — beyond the reference, whose scaling stops at ZeRO-1);
- gradients are averaged across devices BY XLA (the sharded batch + replicated
  params make the psum implicit in the lowering);
- host side stays a plain `for batch in dataset` loop with callbacks.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from nexus_tpu.modules.optimizer import get_lr_scheduler, get_optimizer
from nexus_tpu.parallel.mesh import DATA_AXIS, data_parallel_shardings, get_default_mesh, shard_batch
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.callback import (
    Callback,
    CheckpointCallback,
    EarlyStopCallback,
    ItemVectorCallback,
    LoggerCallback,
    StopCallback,
    ThroughputCallback,
)
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.trainer")


def _prefetch(iterator, size: int = 2):
    """Host-side async prefetch: a daemon thread keeps `size` batches ahead
    (parquet reads + side-table joins overlap device compute).

    Abandonment-safe: when the consumer stops early (early-stop callback,
    preemption, an exception in the step) the generator's ``finally`` sets a
    stop event and drains the queue so the worker exits instead of blocking
    in ``put`` forever — a leaked worker pins its in-flight batches in
    memory for the life of the process (observed as dozens of blocked
    threads across a long test run)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()
    err: list = []

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the training loop
            err.append(e)
        finally:
            # guaranteed delivery while the consumer is live; a stopped
            # consumer no longer needs the sentinel
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while t.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.05)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


class RecTrainer:
    """Generic trainer over a model implementing the nexus_tpu model protocol:

        model.init_variables(key)                  -> variables
        model.loss_fn(variables, batch, rng)       -> (loss, {'batch_stats': ...})
        model.eval_step(variables, batch, **ctx)   -> (pred, target)
        model.eval_context(variables)              -> dict of extra arrays
        model.compute_metrics(preds, targets)      -> {name: value}
        model.save(dir, variables)
    """

    def __init__(
        self,
        model,
        training_args: TrainingArguments,
        mesh=None,
        optimizer: Optional[optax.GradientTransformation] = None,
        callbacks: Optional[list] = None,
        shard_opt_state: bool = False,
        shard_embedding_tables: bool = False,
        shard_tensor_parallel: bool = False,
        shard_experts: bool = False,
    ):
        self.model = model
        self.args = training_args
        # plumb eval metric config through to the model (reference passes
        # metrics/cutoffs via TrainingArguments)
        mc = getattr(model, "model_config", None)
        if mc is not None:
            if getattr(mc, "metrics", None) is None and training_args.metrics:
                try:
                    mc.metrics = list(training_args.metrics)
                except Exception:
                    pass
            if getattr(mc, "cutoffs", None) is None and training_args.cutoffs:
                try:
                    mc.cutoffs = list(training_args.cutoffs)
                except Exception:
                    pass
        if training_args.fast_prng and jax.default_backend() == "tpu":
            try:
                jax.config.update("jax_default_prng_impl", "rbg")
            except Exception:
                pass
        self.mesh = mesh or get_default_mesh()
        self.should_stop = False
        self.train_summary: Dict[str, float] = {}
        self._state: Optional[TrainState] = None

        schedule = get_lr_scheduler(
            training_args.lr_scheduler,
            learning_rate=training_args.learning_rate,
            warmup_steps=training_args.warmup_steps,
            total_steps=training_args.max_steps or 0,
        )
        tx = optimizer or get_optimizer(
            training_args.optimizer,
            learning_rate=training_args.learning_rate,
            weight_decay=training_args.weight_decay,
            schedule=schedule,
        )
        if training_args.max_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(training_args.max_grad_norm), tx)
        if training_args.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, training_args.gradient_accumulation_steps)
        self.tx = tx
        self.shard_opt_state = shard_opt_state
        self.shard_embedding_tables = shard_embedding_tables
        self.shard_tensor_parallel = shard_tensor_parallel
        self.shard_experts = shard_experts

        self.callbacks: list[Callback] = callbacks or []
        # throughput first so its on_train_end summary exists for the logger
        self.callbacks.append(ThroughputCallback(self._global_batch_size()))
        self.callbacks.append(LoggerCallback())
        if training_args.max_steps:
            self.callbacks.append(StopCallback(training_args.max_steps))
        if training_args.checkpoint_steps:
            self.callbacks.append(CheckpointCallback(training_args.checkpoint_steps, training_args.output_dir))
        if training_args.earlystop_metric:
            self.callbacks.append(
                EarlyStopCallback(
                    training_args.earlystop_metric,
                    patience=training_args.earlystop_patience,
                    greater_is_better=training_args.earlystop_greater_is_better,
                    save_best=training_args.checkpoint_best_ckpt,
                    output_dir=training_args.output_dir,
                )
            )
        if hasattr(model, "update_item_vectors"):
            self.callbacks.append(ItemVectorCallback())

        self._train_step = None
        self._eval_step = None
        from nexus_tpu.training.async_checkpoint import AsyncCheckpointer

        self._checkpointer = AsyncCheckpointer()

    # -- setup ------------------------------------------------------------

    def _global_batch_size(self) -> int:
        return self.args.per_device_train_batch_size * self.mesh.shape[DATA_AXIS]

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.args.seed)
        variables = self.model.init_variables(rng)
        # models that expose `variables` (the LoRA families) need it SET
        # before trainable_filter() can build the adapter mask — a fresh
        # init used to skip the mask silently, so AdamW allocated full-tree
        # f32 moments for a frozen 1B trunk (8.3 GB of dead optimizer state;
        # found via the Llama-1B bench's 25.3G-of-15.75G HBM compile OOM)
        if hasattr(self.model, "variables") and self.model.variables is None:
            self.model.variables = variables
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        # adapter-only training (LoRA): frozen params get zero updates
        if hasattr(self.model, "trainable_filter"):
            mask = self.model.trainable_filter()
            if mask is not None:
                labels = jax.tree_util.tree_map(
                    lambda trainable: "train" if trainable else "freeze", mask["params"]
                )
                self.tx = optax.multi_transform(
                    {"train": self.tx, "freeze": optax.set_to_zero()}, labels
                )
        opt_state = self.tx.init(params)
        batch_sh, rep_sh = data_parallel_shardings(self.mesh)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state,
        )
        if (self.shard_opt_state or self.shard_embedding_tables
                or self.shard_tensor_parallel or self.shard_experts):
            from nexus_tpu.parallel.mesh import (
                embedding_shardings,
                expert_parallel_shardings,
                tensor_parallel_shardings,
                zero1_shardings,
            )

            param_sh = jax.tree_util.tree_map(lambda _: rep_sh, params)
            if self.shard_embedding_tables:
                # model-parallel row sharding for big embedding tables
                # (TorchRec row-wise parity)
                param_sh = embedding_shardings(params, self.mesh)

            def _merge(extra_sh):
                return jax.tree_util.tree_map(
                    lambda base, s: base if s.is_fully_replicated else s,
                    param_sh, extra_sh,
                )

            if self.shard_tensor_parallel:
                # Megatron-style column/row layout for the transformer trunk
                # (beyond-reference: its scaling stops at ZeRO-1 DP)
                param_sh = _merge(tensor_parallel_shardings(params, self.mesh))
            if self.shard_experts:
                # expert axis of MMoE/MultiExperts stacks over `model`
                param_sh = _merge(expert_parallel_shardings(params, self.mesh))
            any_sharded = any(
                not s.is_fully_replicated for s in jax.tree_util.tree_leaves(param_sh)
            )
            if any_sharded:
                # optimizer moments mirror the param layout STRUCTURALLY:
                # any opt-state subtree shaped like the param tree (adam
                # mu/nu, MultiSteps acc_grads, ...) takes the param specs
                # wholesale. (Shape-keyed matching collides under TP, where
                # column q/k/v_proj and row o_proj share one shape.)
                p_struct = jax.tree_util.tree_structure(params)
                p_shapes = [p.shape for p in jax.tree_util.tree_leaves(params)]

                def is_param_tree(node):
                    try:
                        if jax.tree_util.tree_structure(node) != p_struct:
                            return False
                        return [
                            getattr(l, "shape", None)
                            for l in jax.tree_util.tree_leaves(node)
                        ] == p_shapes
                    except Exception:
                        return False

                opt_sh = jax.tree_util.tree_map(
                    lambda node: param_sh if is_param_tree(node) else rep_sh,
                    opt_state, is_leaf=is_param_tree,
                )
            else:
                opt_sh = rep_sh
            if self.shard_opt_state:
                # ZeRO-1: optimizer moments sharded over the data axis
                # (DeepSpeed stage-1 parity)
                opt_sh = zero1_shardings(opt_state, self.mesh)
            self._state_shardings = TrainState(
                step=rep_sh,
                params=param_sh,
                batch_stats=jax.tree_util.tree_map(lambda _: rep_sh, batch_stats),
                opt_state=opt_sh,
            )
            state = jax.device_put(state, self._state_shardings)
        else:
            self._state_shardings = rep_sh
            state = jax.device_put(state, rep_sh)
        self._state = state
        return state

    def state_variables(self) -> dict:
        return self._state.variables if self._state is not None else None

    def _build_train_step(self):
        model = self.model

        def train_step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_of(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                loss, aux = model.loss_fn(variables, batch, rng)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_bs = aux.get("batch_stats") or state.batch_stats
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt,
            )
            return new_state, {"loss": loss}

        _, rep_sh = data_parallel_shardings(self.mesh)
        state_sh = getattr(self, "_state_shardings", rep_sh)
        # batch shardings are inherited from shard_batch's per-leaf placement
        # (leaves with a ragged leading dim are replicated there)
        return jax.jit(
            train_step,
            in_shardings=(state_sh, None, rep_sh),
            out_shardings=(state_sh, rep_sh),
            donate_argnums=(0,),
        )

    def _build_eval_step(self, static_ctx: dict):
        model = self.model

        def eval_step(variables, batch, array_ctx):
            return model.eval_step(variables, batch, **array_ctx, **static_ctx)

        _, rep_sh = data_parallel_shardings(self.mesh)
        return jax.jit(eval_step, in_shardings=(rep_sh, None, rep_sh))

    def _maybe_init_sampler(self) -> None:
        """Quantized samplers (MIDX/cluster/LSH) need codebooks built from
        item vectors before the first batch; build them here and auto-register
        the refresh callback so they track the training item encoder."""
        model = self.model
        sampler = getattr(model, "negative_sampler", None)
        if sampler is None or not hasattr(model, "update_sampler_index"):
            return
        if not getattr(sampler, "needs_update", False):
            return
        from nexus_tpu.training.callback import SamplerRefreshCallback

        model.update_sampler_index(
            jax.random.PRNGKey(self.args.seed), self.state_variables()
        )
        self._train_step = None  # bake the fresh index into the program
        if not any(isinstance(cb, SamplerRefreshCallback) for cb in self.callbacks):
            self.callbacks.append(SamplerRefreshCallback())
        logger.info("sampler index initialized (%s)", type(sampler).__name__)

    # -- loops ------------------------------------------------------------

    def train(
        self,
        train_data: Callable[[], Iterable[dict]] | Iterable[dict],
        eval_data: Optional[Callable[[], Iterable[dict]]] = None,
        resume_from_checkpoint: Optional[str] = None,
    ) -> TrainState:
        if self._state is None:
            self.init_state()
        if getattr(self.args, "preemption_safe", False):
            from nexus_tpu.training.preemption import (
                PreemptionGuard,
                find_preemption_checkpoint,
            )

            if not any(isinstance(cb, PreemptionGuard) for cb in self.callbacks):
                self.callbacks.append(PreemptionGuard(self.args.output_dir))
            if resume_from_checkpoint is None:
                # a PREEMPTED.json marker in output_dir means the previous
                # run of this job was killed by the platform — continue it
                resume_from_checkpoint = find_preemption_checkpoint(self.args.output_dir)
        if resume_from_checkpoint:
            self.load_model(resume_from_checkpoint)
        self._maybe_init_sampler()
        if self._train_step is None:
            self._train_step = self._build_train_step()
        rng = jax.random.PRNGKey(self.args.seed + 1)
        _, rep_sh = data_parallel_shardings(self.mesh)
        rng = jax.device_put(rng, rep_sh)

        for cb in self.callbacks:
            cb.on_train_begin(self)

        step = int(self._state.step)
        pending_losses: list = []  # device arrays; host-sync only on logging
        # boundaries (each float() costs a full host round-trip per step)
        # mid-epoch resume: replay the deterministic pipeline (seed + epoch)
        # and fast-forward past already-trained batches (file+offset cursor
        # saved by _save_trainer_state; host-side reads only, no device steps)
        start_epoch, skip_batches = getattr(self, "_resume_cursor", (0, 0))
        self._resume_cursor = (0, 0)
        try:
            for epoch in range(start_epoch, self.args.num_train_epochs):
                data_iter = train_data() if callable(train_data) else train_data
                if hasattr(data_iter, "set_epoch"):
                    data_iter.set_epoch(epoch)
                batch_in_epoch = 0
                for batch in _prefetch(iter(data_iter)):
                    if epoch == start_epoch and batch_in_epoch < skip_batches:
                        batch_in_epoch += 1
                        continue
                    batch_in_epoch += 1
                    self._data_cursor = (epoch, batch_in_epoch)
                    if self.args.profile_step_start is not None and step == self.args.profile_step_start:
                        jax.profiler.start_trace(os.path.join(self.args.output_dir, "profile"))
                    batch.pop("_nvalid", None)
                    device_batch = shard_batch(batch, self.mesh)
                    if self._train_step is None:  # invalidated (e.g. sampler refresh)
                        self._train_step = self._build_train_step()
                    self._state, metrics = self._train_step(self._state, device_batch, rng)
                    step += 1
                    pending_losses.append(metrics["loss"])
                    if self.args.profile_step_end is not None and step == self.args.profile_step_end:
                        jax.tree_util.tree_map(
                            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                            self._state.params,
                        )
                        jax.profiler.stop_trace()
                        logger.info("profiler trace written to %s/profile", self.args.output_dir)
                    if step % self.args.logging_steps == 0:
                        mean_loss = float(jnp.mean(jnp.stack(pending_losses)))
                        pending_losses = []
                        logs = {"step": step, "epoch": epoch, "loss": mean_loss}
                        for cb in self.callbacks:
                            cb.on_log(self, logs)
                    for cb in self.callbacks:
                        cb.on_step_end(self, step)
                    if self.should_stop:
                        break
                if not self.should_stop:  # epoch fully consumed: resume at next
                    self._data_cursor = (epoch + 1, 0)
                eval_metrics = None
                if eval_data is not None and self.args.evaluation_strategy != "no":
                    eval_metrics = self.evaluate(eval_data)
                for cb in self.callbacks:
                    cb.on_epoch_end(self, epoch, eval_metrics)
                if self.should_stop:
                    break

        except BaseException:
            # the loop is aborting: land any in-flight background write
            # first — daemon writer threads die with the process and
            # would leave a truncated checkpoint that poisons resume.
            # Logged, not raised: the original exception wins.
            self._checkpointer.drain()
            raise

        for cb in self.callbacks:
            cb.on_train_end(self)
        # an async checkpoint still in flight must land before train()
        # returns (callers read/serve the output dir immediately after)
        self._checkpointer.wait()
        return self._state

    def evaluate(self, eval_data: Callable[[], Iterable[dict]] | Iterable[dict]) -> Dict[str, float]:
        variables = self._state.variables
        ctx = self.model.eval_context(variables) if hasattr(self.model, "eval_context") else {}
        array_ctx = {k: v for k, v in ctx.items() if isinstance(v, (jnp.ndarray, np.ndarray))}
        static_ctx = {k: v for k, v in ctx.items() if k not in array_ctx}
        static_key = tuple(sorted(static_ctx.items()))
        if self._eval_step is None or getattr(self, "_eval_static_key", None) != static_key:
            self._eval_step = self._build_eval_step(static_ctx)
            self._eval_static_key = static_key
        preds, targets = [], []
        data_iter = eval_data() if callable(eval_data) else eval_data
        for batch in data_iter:
            nvalid = int(batch.pop("_nvalid", 0)) or None
            device_batch = shard_batch(batch, self.mesh)
            # re-read per batch: TDE eval loaders swap cache rows into the
            # state as the iterator admits evicted ids (transform_batch) —
            # a one-time snapshot would score stale embedding rows
            variables = self._state.variables
            pred, target = self._eval_step(variables, device_batch, array_ctx)
            pred, target = np.asarray(pred), np.asarray(target)
            if nvalid:
                pred, target = pred[:nvalid], target[:nvalid]
            preds.append(pred)
            targets.append(target)
        if not preds:
            return {}
        pred = np.concatenate(preds, axis=0)
        target = np.concatenate(targets, axis=0)
        return self.model.compute_metrics(pred, target)

    # -- persistence ------------------------------------------------------

    def save_model(self, output_dir: Optional[str] = None,
                   blocking: Optional[bool] = None) -> None:
        """Model weights (+ full trainer state for exact resume).

        With ``TrainingArguments.async_checkpoint`` the device->host snapshot
        happens here (before the next step donates the state buffers) and the
        serialization + file writes overlap training on a background thread —
        one save in flight, errors re-raised at the next save/wait
        (training/async_checkpoint.py). ``blocking=True`` forces a durable
        synchronous save regardless (preemption, final save)."""
        output_dir = output_dir or self.args.output_dir
        os.makedirs(output_dir, exist_ok=True)
        use_async = self.args.async_checkpoint if blocking is None else not blocking
        # join any in-flight save first: ordered checkpoints, and a second
        # save to the same dir must not interleave file writes with the first
        self._checkpointer.wait()
        if not use_async:
            self.model.save(output_dir, self._state.variables)
            self._save_trainer_state(output_dir)
            return
        host_vars = jax.device_get(self._state.variables)
        state_host = jax.device_get(
            {"step": self._state.step, "opt_state": self._state.opt_state}
        )
        cursor = getattr(self, "_data_cursor", None)
        model, seed = self.model, self.args.seed
        # snapshot mutable model-side state on THIS thread: the background
        # write must not read live attributes (an epoch-end item-vector
        # refresh racing the writer would tear the checkpoint — params from
        # step N next to vectors from step M), and fetching device arrays
        # belongs on the training thread per the closure contract
        save_kw = {}
        if getattr(model, "item_vectors", None) is not None:
            save_kw["item_vectors"] = np.asarray(
                jax.device_get(model.item_vectors))

        def write():
            model.save(output_dir, host_vars, **save_kw)
            _write_trainer_state(output_dir, state_host, cursor, seed)

        self._checkpointer.submit(write, target=output_dir)

    def _save_trainer_state(self, output_dir: str) -> None:
        state_host = jax.tree_util.tree_map(
            lambda x: np.asarray(x), {"step": self._state.step, "opt_state": self._state.opt_state}
        )
        _write_trainer_state(
            output_dir, state_host, getattr(self, "_data_cursor", None), self.args.seed
        )

    def load_model(self, checkpoint_dir: str) -> None:
        """Restore model weights; when trainer_state.msgpack is present,
        also restore optimizer state + step (exact resume, HF
        resume_from_checkpoint parity).

        Weight restore is delegated to the model when it implements the
        ``load_variables(dir, current=...)`` protocol method (text/multimodal
        models save HF-layout dirs, not the rec model_config.json schema);
        the rec checkpoint loader is the fallback."""
        from flax import serialization

        # a checkpoint still being written must be durable before reading it
        self._checkpointer.wait()
        if self._state is None:
            self.init_state()
        if hasattr(self.model, "load_variables"):
            variables = self.model.load_variables(
                checkpoint_dir, current=self._state.variables
            )
        else:
            from nexus_tpu.training.checkpoint import load_checkpoint

            _, variables = load_checkpoint(checkpoint_dir, type(self.model))
        _, rep_sh = data_parallel_shardings(self.mesh)
        params = jax.device_put(variables["params"], rep_sh)
        bs = jax.device_put(variables.get("batch_stats", FrozenDict()), rep_sh)
        self._state = self._state.replace(params=params, batch_stats=bs)
        ts_path = os.path.join(checkpoint_dir, "trainer_state.msgpack")
        if os.path.exists(ts_path):
            target = jax.tree_util.tree_map(
                lambda x: np.asarray(x), {"step": self._state.step, "opt_state": self._state.opt_state}
            )
            with open(ts_path, "rb") as f:
                restored = serialization.from_bytes(target, f.read())
            opt_sh = (
                self._state_shardings.opt_state
                if isinstance(getattr(self, "_state_shardings", None), TrainState)
                else rep_sh
            )
            self._state = self._state.replace(
                step=jnp.asarray(restored["step"]),
                opt_state=jax.device_put(restored["opt_state"], opt_sh),
            )
            logger.info("resumed trainer state at step %d", int(self._state.step))
        cursor_path = os.path.join(checkpoint_dir, "data_cursor.json")
        if os.path.exists(cursor_path):
            import json

            with open(cursor_path) as f:
                cur = json.load(f)
            if cur.get("seed", self.args.seed) != self.args.seed:
                logger.warning(
                    "checkpoint data cursor was written with seed %s but this run "
                    "uses seed %s — the fast-forward will not replay the same "
                    "batches; ignoring the cursor", cur.get("seed"), self.args.seed,
                )
            else:
                self._resume_cursor = (int(cur["epoch"]), int(cur["batch_in_epoch"]))
                logger.info(
                    "mid-epoch resume: epoch %d, fast-forwarding %d batches",
                    cur["epoch"], cur["batch_in_epoch"],
                )


def _write_trainer_state(output_dir: str, state_host: dict, cursor, seed: int) -> None:
    """Write trainer_state.msgpack + data_cursor.json from host snapshots.

    Shared by the synchronous path and the async background writer (which
    must not touch device arrays — see training/async_checkpoint.py)."""
    import json

    from flax import serialization

    with open(os.path.join(output_dir, "trainer_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state_host))
    if cursor is not None:
        with open(os.path.join(output_dir, "data_cursor.json"), "w") as f:
            json.dump({"epoch": cursor[0], "batch_in_epoch": cursor[1],
                       "seed": seed}, f)
