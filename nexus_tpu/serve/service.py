"""Serving services (parity: serve/inference_service.py and
serve/inference_service_text_retrieval.py).

The reference serves Gradio demo UIs; here serving is a dependency-free HTTP
JSON API (stdlib http.server, threaded) exposing the same two flows:

- recommendation cascade: POST /recommend {"user_ids": [...]} ->
  retrieve (u2i/i2i) -> rank -> top-k items, with per-stage timing;
- text retrieval: POST /search {"query": "...", "top_k": 10} ->
  embed -> index search -> optional cross-encoder rerank.

Engines are the inference-layer engines; the device work stays batched and
compiled. A production deployment would put this behind a real frontend, but
the request contract is the same as the reference's service functions.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from nexus_tpu.serve.batching import DeadlineExceeded, Overloaded
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.serve")


class _JsonHandler(BaseHTTPRequestHandler):
    routes = {}

    def log_message(self, fmt, *args):  # quiet
        logger.debug("http: " + fmt, *args)

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._reply(200, {"status": "ok"})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        handler = self.routes.get(self.path)
        if handler is None:
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            t0 = time.perf_counter()
            result = handler(payload)
            result["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
            self._reply(200, result)
        except Overloaded as e:
            # admission-control shed: queue at capacity — fail fast so the
            # client can retry/back off instead of queueing into a timeout
            self._reply(503, {"error": f"overloaded: {e}"})
        except DeadlineExceeded as e:
            self._reply(504, {"error": f"deadline exceeded: {e}"})
        except Exception as e:  # surface errors as JSON
            logger.exception("request failed")
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


class _ServiceBase:
    def __init__(self, host: str = "127.0.0.1", port: int = 8080):
        self.host = host
        self.port = port
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    def routes(self) -> dict:
        raise NotImplementedError

    def start(self, block: bool = False):
        handler = type("Handler", (_JsonHandler,), {"routes": self.routes()})
        self._server = ThreadingHTTPServer((self.host, self.port), handler)
        self.port = self._server.server_address[1]
        if block:
            logger.info("serving on %s:%d", self.host, self.port)
            self._server.serve_forever()
        else:
            self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
            self._thread.start()
            logger.info("serving (background) on %s:%d", self.host, self.port)
        return self

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server.server_close()


class InferenceService(_ServiceBase):
    """Two-stage recommendation cascade (parity: serve/inference_service.py:21-62).

    TPU addition (mirrors TextRetrievalService): concurrent /recommend
    requests are dynamically micro-batched — co-boarded requests' user_ids
    ride ONE hydration + ONE retrieve + ONE rank pass instead of paying the
    per-call dispatch floor each."""

    def __init__(self, retriever_engine, ranker_engine=None,
                 max_batch: int = 32, batch_wait_ms: float = 4.0,
                 workers: int = 2, max_queue: Optional[int] = 256,
                 deadline_ms: Optional[float] = None, **kw):
        super().__init__(**kw)
        from nexus_tpu.serve.batching import MicroBatcher

        self.retriever = retriever_engine
        self.ranker = ranker_engine
        # workers=2: the hydrate+decode host leg of one departing batch
        # overlaps the previous batch's device call (see TextRetrievalService)
        self._batcher = MicroBatcher(
            self._recommend_many, max_batch=max_batch,
            max_wait_ms=batch_wait_ms, name="recommend", workers=workers,
            max_queue=max_queue, deadline_ms=deadline_ms)

    @staticmethod
    def _context_covers(ctx: Dict, data_attr) -> bool:
        """True when a hydrated context dict satisfies another model's
        feature schema (same recflow config across cascade stages)."""
        if any(f not in ctx for f in data_attr.context_features):
            return False
        for s, feats in (data_attr.seq_features or {}).items():
            sub = ctx.get(s)
            if not isinstance(sub, dict) or any(f not in sub for f in feats):
                return False
            if any(sub[f].shape[1] != data_attr.seq_lengths[s] for f in feats):
                return False
        return True

    def _recommend_many(self, payloads: List[Dict]) -> List[Dict]:
        """One departing batch: co-boarded requests' user_ids concatenate
        into ONE cascade pass (one mget+decode hydration, one fused
        retrieve, one rank), then split back per request by offsets."""
        all_ids: List = []
        offsets = [0]
        for p in payloads:
            all_ids.extend(p["user_ids"])
            offsets.append(len(all_ids))
        # hydrate user/context features ONCE for the whole cascade (the
        # reference's ranker stage re-reads the same user keys from Redis,
        # reranker base.py:121; here both stages share one mget+decode when
        # their feature schemas agree)
        context = None
        if self.ranker is not None and self.retriever.retrieve_mode != "i2i":
            context = self.retriever.get_user_context_features(all_ids)
        retrieved = self.retriever.batch_inference(all_ids, context=context)
        ranked = None
        if self.ranker is not None:
            ranker_ctx = (
                context
                if context is not None and self._context_covers(context, self.ranker.data_attr)
                else None
            )
            ranked = self.ranker.batch_inference(
                all_ids, retrieved["item_ids"], context=ranker_ctx
            )
        timers = {
            "retriever": dict(self.retriever.timers),
            **({"ranker": dict(self.ranker.timers)} if self.ranker else {}),
        }
        out = []
        for i, p in enumerate(payloads):
            lo, hi = offsets[i], offsets[i + 1]
            result = {
                "user_ids": p["user_ids"],
                "retrieved": retrieved["item_ids"][lo:hi].tolist(),
            }
            if ranked is not None:
                result["ranked"] = ranked["item_ids"][lo:hi].tolist()
            result["timers"] = timers
            out.append(result)
        return out

    def recommend(self, payload: Dict) -> Dict:
        if "user_ids" not in payload:  # validate BEFORE boarding a batch
            raise KeyError("user_ids")
        return self._batcher(payload)

    def stats(self, payload: Dict) -> Dict:
        return {"recommend_batcher": self._batcher.stats}

    def stop(self):
        super().stop()
        self._batcher.close()

    def list_users(self, payload: Dict) -> Dict:
        pattern = payload.get("pattern", "user:*")
        keys = self.retriever.kv.keys(pattern)[: payload.get("limit", 100)]
        return {"user_ids": [k.split(":", 1)[1] for k in keys]}

    def routes(self):
        return {"/recommend": self.recommend, "/users": self.list_users,
                "/stats": self.stats}


class TextRetrievalService(_ServiceBase):
    """Retrieve -> rerank text search
    (parity: serve/inference_service_text_retrieval.py).

    TPU addition: concurrent /search requests are dynamically micro-batched
    (serve/batching.py) — queries board one encode + one index search + one
    rerank scoring call instead of paying the ~25 ms dispatch floor each.
    ``batch_wait_ms=0`` still sweeps already-queued requests with zero added
    latency; the default few-ms boarding window trades a hair of p50 for an
    up-to-``max_batch``x concurrent-throughput multiplier.
    """

    def __init__(self, embedder_engine, corpus: Dict[str, str], reranker_engine=None,
                 index=None, max_batch: int = 32, batch_wait_ms: float = 4.0,
                 workers: int = 2, max_queue: Optional[int] = 256,
                 deadline_ms: Optional[float] = None, **kw):
        super().__init__(**kw)
        from nexus_tpu.inference.index import ItemIndex
        from nexus_tpu.serve.batching import MicroBatcher

        self.embedder = embedder_engine
        self.reranker = reranker_engine
        self.doc_ids = list(corpus.keys())
        self.corpus = corpus
        if index is None:
            doc_embs = np.asarray(self.embedder.encode_corpus([corpus[d] for d in self.doc_ids]))
            index = ItemIndex.build(doc_embs, index_type="flat")
        self.index = index
        # workers=2 pipelines the tokenizer (GIL-releasing host leg) of one
        # departing batch against the device call of the previous one — the
        # /search path is tokenizer-bound under load (BENCH_NOTES r4)
        self._batcher = MicroBatcher(
            self._search_many, max_batch=max_batch, max_wait_ms=batch_wait_ms,
            name="search", workers=workers, max_queue=max_queue,
            deadline_ms=deadline_ms)

    def _search_many(self, payloads: List[Dict]) -> List[Dict]:
        """One departing batch: every device stage runs ONCE for all boarded
        requests (encode [B,D], index search [B,k], rerank over the
        concatenated candidate pairs)."""
        queries = [p["query"] for p in payloads]
        top_ks = [int(p.get("top_k", 10)) for p in payloads]
        q = np.asarray(self.embedder.encode_queries(queries))
        k = min(max(top_ks) * 5, len(self.doc_ids))
        scores, rows = self.index.search(q, k)
        cand_lists = [[self.doc_ids[int(r)] for r in rows[i]] for i in range(len(queries))]
        if self.reranker is not None:
            pairs = [(queries[i], self.corpus[d])
                     for i, cands in enumerate(cand_lists) for d in cands]
            flat = np.asarray(self.reranker.compute_score(pairs))
            out, off = [], 0
            for i, cands in enumerate(cand_lists):
                rr = flat[off:off + len(cands)]
                off += len(cands)
                order = np.argsort(rr)[::-1][: top_ks[i]]
                hits = [
                    {"doc_id": cands[j], "score": float(rr[j]), "text": self.corpus[cands[j]]}
                    for j in order
                ]
                out.append({"query": queries[i], "hits": hits})
            return out
        return [
            {
                "query": queries[i],
                "hits": [
                    {"doc_id": d, "score": float(s), "text": self.corpus[d]}
                    for d, s in zip(cand_lists[i][: top_ks[i]], scores[i][: top_ks[i]])
                ],
            }
            for i in range(len(queries))
        ]

    def search(self, payload: Dict) -> Dict:
        if "query" not in payload:  # validate BEFORE boarding a batch — a
            raise KeyError("query")  # bad request must not fail co-boarders
        return self._batcher(payload)

    def stats(self, payload: Dict) -> Dict:
        return {"search_batcher": self._batcher.stats}

    def stop(self):
        super().stop()
        self._batcher.close()

    def routes(self):
        return {"/search": self.search, "/stats": self.stats}
