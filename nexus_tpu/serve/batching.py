"""Dynamic request micro-batching for serving (TPU-first addition).

Every device dispatch on this platform costs ~25 ms before any math runs,
and a compiled encode program is equally happy with 1 or 64 sequences — so
under concurrent load, per-request device calls waste almost the whole chip.
This module coalesces concurrent single-item requests into one batched
device call, the standard dynamic-batching pattern of production inference
servers (what TensorRT Inference Server / Triton does for the reference's
engines; the reference itself serves Gradio demos with no batching —
serve/inference_service_text_retrieval.py).

Latency contract: the FIRST item of a batch waits at most ``max_wait_ms``
for followers (nothing at all when the queue is idle and the previous batch
is still running — the wait overlaps device compute); followers board the
next departing batch. With a 25 ms dispatch floor, a few ms of boarding
time buys an up-to-``max_batch``x throughput multiplier.

Overload protection (round-5): an unbounded queue turns overload into
unbounded latency — every request eventually gets served, seconds too late.
Production behavior is to keep the queue short and FAIL FAST instead:
``max_queue`` caps the number of waiting items (submit sheds with
:class:`Overloaded`, the HTTP layer maps it to 503) and ``deadline_ms``
drops requests that waited longer than the caller would have (they fail
with :class:`DeadlineExceeded`/504 *before* boarding a device batch, so an
expired request costs zero chip time). Both are observable via ``stats``.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence


class Overloaded(RuntimeError):
    """Request shed at admission: the batcher queue is at capacity (HTTP 503)."""


class DeadlineExceeded(RuntimeError):
    """Request expired in the queue before boarding a batch (HTTP 504)."""


_SENTINEL = object()  # close() wake-up marker (never a user item)


class MicroBatcher:
    """Coalesce concurrent ``submit`` calls into batched ``batch_fn`` calls.

    Parameters
    ----------
    batch_fn: called with a list of items, must return a sequence of results
        of the same length and order.
    max_batch: hard batch-size cap (match the compiled program's bucket).
    max_wait_ms: how long the first item of a batch waits for followers.
    name: for stats/debugging.
    workers: number of batch workers. With ``workers=2`` the host half of
        batch N+1 (tokenization, feature decode — C code that releases the
        GIL) overlaps batch N's device call (blocking fetches also release
        it), pipelining the two legs even on a single host core. The shared
        queue hands each request to exactly one worker; the engines
        serialize their host-side mutable state (tokenizer, lazy jit-cache
        population) behind their own locks, and device calls serialize on
        the chip. Measured: the /search service is tokenizer-bound under
        load on a 1-core host (BENCH_NOTES round 4) — this is the lever.
    max_queue: queue capacity; ``submit`` raises :class:`Overloaded` when
        this many items are already waiting (None = unbounded, the pre-r5
        behavior). Size it to ~the latency budget divided by per-item
        service time: a deeper queue only manufactures timeouts.
    deadline_ms: per-request time budget measured from ``submit``; items
        still queued past it fail with :class:`DeadlineExceeded` instead of
        boarding (None = no deadline). A per-call override can be passed to
        ``submit``.
    """

    def __init__(self, batch_fn: Callable[[List], Sequence], *,
                 max_batch: int = 64, max_wait_ms: float = 4.0,
                 name: str = "batcher", workers: int = 1,
                 max_queue: Optional[int] = None,
                 deadline_ms: Optional[float] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if workers < 1:
            raise ValueError("workers must be >= 1")
        if max_queue is not None and max_queue < 1:
            raise ValueError("max_queue must be >= 1 (or None)")
        self.batch_fn = batch_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.name = name
        self.max_queue = max_queue
        self.deadline_s = None if deadline_ms is None else float(deadline_ms) / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        # stats
        self.n_items = 0
        self.n_batches = 0
        self.n_errors = 0
        self.n_shed = 0
        self.n_expired = 0
        self._n_queued = 0  # items (not sentinels) currently waiting
        self._workers = [
            threading.Thread(target=self._loop, daemon=True,
                             name=f"microbatch-{name}-{i}")
            for i in range(int(workers))
        ]
        for w in self._workers:
            w.start()

    # -- client side ---------------------------------------------------------

    def submit(self, item, deadline_ms: Optional[float] = None) -> Future:
        fut: Future = Future()
        dl = self.deadline_s if deadline_ms is None else float(deadline_ms) / 1e3
        expires = None if dl is None else time.monotonic() + dl
        with self._lock:
            if self._closed:
                raise RuntimeError(f"MicroBatcher {self.name!r} is closed")
            if self.max_queue is not None and self._n_queued >= self.max_queue:
                self.n_shed += 1
                raise Overloaded(
                    f"MicroBatcher {self.name!r} queue full "
                    f"({self._n_queued}/{self.max_queue} waiting)")
            self._n_queued += 1
            self._q.put((item, fut, expires))
        return fut

    def __call__(self, item, deadline_ms: Optional[float] = None):
        """Synchronous convenience: submit and wait."""
        return self.submit(item, deadline_ms=deadline_ms).result()

    def close(self):
        with self._lock:
            if self._closed:
                return
            self._closed = True
            for _ in self._workers:
                self._q.put(_SENTINEL)  # wake every worker (after real items)
        for w in self._workers:
            w.join(timeout=30.0)
        # fail anything still queued (a worker died, or items slipped in
        # between the sentinel drain and thread exit) — a Future that never
        # resolves blocks its caller forever
        while True:
            try:
                entry = self._q.get_nowait()
            except queue.Empty:
                break
            if entry is _SENTINEL:
                continue
            _, fut, _ = entry
            if not fut.done() and not fut.cancelled():
                fut.set_exception(
                    RuntimeError(f"MicroBatcher {self.name!r} closed"))

    @property
    def stats(self) -> dict:
        b = max(self.n_batches, 1)
        return {
            "items": self.n_items,
            "batches": self.n_batches,
            "errors": self.n_errors,
            "shed": self.n_shed,
            "expired": self.n_expired,
            "queued": self._n_queued,
            "mean_batch_size": round(self.n_items / b, 2),
        }

    # -- worker side ---------------------------------------------------------

    def _take(self, entry) -> Optional[tuple]:
        """Account a dequeued entry; expire it here (pre-boarding) if its
        deadline passed — an expired request must cost zero device time."""
        with self._lock:
            self._n_queued -= 1
        item, fut, expires = entry
        if expires is not None and time.monotonic() > expires:
            with self._lock:
                self.n_expired += 1
            if not fut.cancelled():
                fut.set_exception(DeadlineExceeded(
                    f"request expired in {self.name!r} queue before boarding"))
            return None
        return (item, fut)

    def _collect(self) -> Optional[List]:
        """One departing batch: first item blocks, followers board until
        max_batch or the boarding window closes."""
        batch: List[tuple] = []
        while not batch:  # first VALID item starts the boarding window
            first = self._q.get()
            if first is _SENTINEL:
                return None
            taken = self._take(first)
            if taken is not None:
                batch.append(taken)
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # still sweep anything already queued (no extra waiting)
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
            else:
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
            if nxt is _SENTINEL:
                self._q.put(_SENTINEL)  # re-arm shutdown for the outer loop
                break
            taken = self._take(nxt)
            if taken is not None:
                batch.append(taken)
        return batch

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            items = [it for it, _ in batch]
            futs = [f for _, f in batch]
            try:
                results = self.batch_fn(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"batch_fn returned {len(results)} results for "
                        f"{len(items)} items")
            except BaseException as e:
                with self._lock:
                    self.n_errors += len(futs)
                for f in futs:
                    if not f.cancelled():
                        f.set_exception(e)
                continue
            with self._lock:
                self.n_items += len(items)
                self.n_batches += 1
            for f, r in zip(futs, results):
                if not f.cancelled():
                    f.set_result(r)
