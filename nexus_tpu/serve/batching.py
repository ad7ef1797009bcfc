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
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence


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
        queue hands each request to exactly one worker; device calls
        serialize on the chip, so correctness is unchanged. Measured: the
        /search service is tokenizer-bound under load on a 1-core host
        (BENCH_NOTES round 4) — this is the lever for it.
    """

    def __init__(self, batch_fn: Callable[[List], Sequence], *,
                 max_batch: int = 64, max_wait_ms: float = 4.0,
                 name: str = "batcher", workers: int = 1):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if workers < 1:
            raise ValueError("workers must be >= 1")
        self.batch_fn = batch_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.name = name
        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        # stats
        self.n_items = 0
        self.n_batches = 0
        self.n_errors = 0
        self._workers = [
            threading.Thread(target=self._loop, daemon=True,
                             name=f"microbatch-{name}-{i}")
            for i in range(int(workers))
        ]
        for w in self._workers:
            w.start()

    # -- client side ---------------------------------------------------------

    def submit(self, item) -> Future:
        if self._closed:
            raise RuntimeError(f"MicroBatcher {self.name!r} is closed")
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def __call__(self, item):
        """Synchronous convenience: submit and wait."""
        return self.submit(item).result()

    def close(self):
        self._closed = True
        for _ in self._workers:
            self._q.put(None)  # wake every worker

    @property
    def stats(self) -> dict:
        b = max(self.n_batches, 1)
        return {
            "items": self.n_items,
            "batches": self.n_batches,
            "errors": self.n_errors,
            "mean_batch_size": round(self.n_items / b, 2),
        }

    # -- worker side ---------------------------------------------------------

    def _collect(self) -> Optional[List]:
        """One departing batch: first item blocks, followers board until
        max_batch or the boarding window closes."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
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
            if nxt is None:
                self._q.put(None)  # re-arm shutdown for the outer loop
                break
            batch.append(nxt)
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
