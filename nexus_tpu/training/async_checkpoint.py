"""Asynchronous checkpointing: overlap checkpoint writes with training.

A synchronous checkpoint at the 1B-parameter scale costs seconds of train
time per save (msgpack serialization + disk write of multiple GB), paid at
every ``checkpoint_steps`` boundary. The TPU-first split is:

- the **device -> host snapshot** stays on the training thread (it must
  complete before the next train step donates the state buffers to XLA —
  reading a donated buffer from a background thread is a crash);
- **serialization + file writes** (the dominant cost) move to a background
  thread that overlaps the next training steps.

``AsyncCheckpointer`` keeps at most ONE save in flight: submitting a new
save (or calling ``wait()``) first joins the previous one, so checkpoints
land in order and a slow disk applies back-pressure instead of a growing
queue of multi-GB host snapshots. Errors raised by a background save are
re-raised on the training thread at the next ``submit``/``wait`` — a save
never fails silently.

The reference has no analog (HF Trainer saves are synchronous); orbax's
AsyncCheckpointer is the same idea for its own format — this one writes
the repo's existing checkpoint schemas (rec ``model_config.json`` dirs and
HF-layout ``flax_model.msgpack`` dirs) unchanged, so every loader keeps
working.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.async_checkpoint")


class AsyncCheckpointer:
    """Run checkpoint-write closures on a background thread, one in flight.

    The closure must only touch host data (numpy trees, config dicts):
    snapshot device arrays with ``jax.device_get`` BEFORE submitting.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._target: Optional[str] = None

    def submit(self, fn: Callable[[], None], target: str = "") -> None:
        """Join any in-flight save (re-raising its error), then start ``fn``."""
        self.wait()
        self._target = target

        def run():
            try:
                fn()
            except BaseException as e:  # re-raised on the training thread
                self._error = e

        self._thread = threading.Thread(
            target=run, name=f"async-ckpt:{target}", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable; re-raise its
        error on this thread."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        err, self._error = self._error, None
        if err is not None:
            target = self._target
            raise RuntimeError(
                f"async checkpoint save to {target!r} failed"
            ) from err

    def drain(self) -> None:
        """Join the in-flight save WITHOUT raising — exception-path cleanup.
        The daemon writer thread must not be killed mid-write by interpreter
        teardown (truncated checkpoint), but the exception already unwinding
        the training loop must stay the one the caller sees; a save failure
        here is logged instead."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        err, self._error = self._error, None
        if err is not None:
            logger.error("async checkpoint save to %r failed during "
                         "teardown: %s", self._target, err)

    @property
    def in_flight(self) -> bool:
        return self._thread is not None and self._thread.is_alive()
