"""Preemption-safe training: signal-triggered checkpoint + clean stop.

TPU VMs (spot/preemptible capacity, maintenance events) receive SIGTERM
with a short grace window before the machine disappears. This module turns
that signal into a clean exit: the in-flight step finishes, a FULL resume
checkpoint is written (weights + optimizer state + the mid-epoch data
cursor the trainer already maintains), a ``PREEMPTED`` marker records
where, and the train loop stops. On the replacement VM,
``find_preemption_checkpoint`` locates the marker and training continues
exactly where it left off through the trainer's existing
``resume_from_checkpoint`` path (deterministic pipeline replay).

The reference framework has no analog (its trainers die with the host and
lose everything since the last periodic save; SURVEY §5 lists failure
detection as absent) — this is TPU-first infrastructure, not parity.

Signal handlers only set a flag (async-signal-safe); all real work happens
on the training thread at the next step boundary, so a signal arriving
mid-XLA-dispatch never corrupts a checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
import signal
import threading
import time
from typing import Iterable, Optional

from .callback import Callback

logger = logging.getLogger("nexus_tpu")

MARKER = "PREEMPTED.json"


class PreemptionGuard(Callback):
    """Callback: on SIGTERM (and optionally SIGINT), checkpoint and stop.

    Usage::

        guard = PreemptionGuard(output_dir)
        trainer = RecTrainer(..., callbacks=[guard, ...])
        trainer.train(data, resume_from_checkpoint=find_preemption_checkpoint(output_dir))

    Parameters
    ----------
    output_dir: checkpoints land in ``<output_dir>/checkpoint-preempt``.
    signals: which signals trigger the guard (default: SIGTERM only —
        SIGINT stays ctrl-C). Pass ``(signal.SIGTERM, signal.SIGINT)`` to
        also catch interactive interrupts.
    """

    def __init__(self, output_dir: str,
                 signals: Iterable[int] = (signal.SIGTERM,)):
        self.output_dir = output_dir
        self.signals = tuple(signals)
        self._flag = threading.Event()
        self._prev = {}
        self._installed = False
        self.checkpoint_dir: Optional[str] = None  # set once saved

    # -- signal plumbing ----------------------------------------------------

    def _handler(self, signum, frame):
        # async-signal-safe: only record the request; the training thread
        # saves at the next step boundary
        self._flag.set()

    def install(self) -> None:
        if self._installed or threading.current_thread() is not threading.main_thread():
            # signal.signal only works on the main thread; a trainer driven
            # from a worker thread polls request_preemption() instead
            return
        for s in self.signals:
            self._prev[s] = signal.signal(s, self._handler)
        self._installed = True

    def uninstall(self) -> None:
        if not self._installed:
            return
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self._installed = False

    def request_preemption(self) -> None:
        """Programmatic trigger (tests, cluster-agent hooks, worker threads)."""
        self._flag.set()

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()

    # -- callback protocol --------------------------------------------------

    def on_train_begin(self, trainer):
        self.install()

    def on_step_end(self, trainer, step):
        if not self._flag.is_set() or self.checkpoint_dir is not None:
            return
        t0 = time.monotonic()
        path = os.path.join(self.output_dir, "checkpoint-preempt")
        # the process is about to die: the checkpoint must be durable before
        # the marker is written, so force a synchronous save even when
        # async_checkpoint is on
        try:
            trainer.save_model(path, blocking=True)
        except Exception:
            # a STALE async-save error re-raised by save_model's initial
            # join must not forfeit the last-chance save: the join cleared
            # the stored error, so one retry runs the synchronous save clean
            logger.exception(
                "preempt save: joining the pending async checkpoint failed; "
                "retrying the synchronous save once")
            try:
                trainer.save_model(path, blocking=True)
            except Exception:
                logger.exception(
                    "preemption checkpoint failed — stopping without a "
                    "resume marker")
                trainer.should_stop = True
                return
        with open(os.path.join(self.output_dir, MARKER), "w") as f:
            json.dump({"checkpoint": path, "step": int(step),
                       "saved_at": time.time()}, f)
        self.checkpoint_dir = path
        trainer.should_stop = True
        logger.warning(
            "preemption signal: saved resume checkpoint at step %d -> %s "
            "(%.1f s), stopping", step, path, time.monotonic() - t0)

    def on_train_end(self, trainer):
        self.uninstall()


def find_preemption_checkpoint(output_dir: str) -> Optional[str]:
    """Resume hook: the checkpoint a previous preempted run left behind.

    Returns the checkpoint path recorded in ``PREEMPTED.json`` (and removes
    the marker so a completed rerun doesn't loop), or None when the
    previous run exited normally.
    """
    marker = os.path.join(output_dir, MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        info = json.load(f)
    path = info.get("checkpoint")
    os.remove(marker)
    if path and os.path.isdir(path):
        logger.info("resuming from preemption checkpoint %s (step %s)",
                    path, info.get("step"))
        return path
    return None
