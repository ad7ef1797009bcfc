"""Recommendation retriever serving engine (parity: Nexus/inference/embedder/
recommendation/base.py:60-592).

Online path per request batch:
  user ids -> FeatureCache mget + proto decode (host, one round-trip)
           -> fixed-shape numpy batch assembly (incl. nested seq features)
           -> compiled query-tower forward (jit/AOT)
           -> u2i: ItemIndex search (on-device matmul+top-k)
              or i2i: precomputed neighbor lists from the KV store.

Timing counters for each stage are kept (parity with the reference's
get_features_time / model_time / faiss_time instrumentation, base.py:131-197).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import numpy as np

from nexus_tpu.inference.feature_store import FeatureCache, FeatureCodec, get_kv_store
from nexus_tpu.inference.index import ItemIndex
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.rec_embedder")


class BaseEmbedderInferenceEngine:
    """Constructed from a plain config dict (reference convention for the
    recommendation engines — YAML dict, not dataclass args)."""

    def __init__(self, config: dict, kv_store=None, item_index: Optional[ItemIndex] = None):
        from nexus_tpu.training.checkpoint import load_checkpoint

        self.config = config
        self.model, self.variables = load_checkpoint(config["model_ckpt_path"])
        self.data_attr = self.model.data_config
        self.retrieve_mode = config.get("retrieve_mode", "u2i")  # u2i | i2i
        self.output_topk = int(config.get("output_topk", 10))

        self.kv = kv_store or get_kv_store(config.get("feature_cache"))
        self.feature_cache = FeatureCache(self.kv, FeatureCodec())
        fc = config.get("feature_cache") or {}
        self.user_key_template = fc.get("user_key_template", "user:{}")
        self.seq_key_template = fc.get("seq_key_template", None)
        self.i2i_key_template = fc.get("i2i_key_template", "i2i:{}")
        # i2i trigger selection/fusion (reference keeps per-trigger top-k
        # lists then truncates, base.py:248-268 — count + fusion are config
        # here rather than the hard-coded [-3:])
        self.i2i_num_triggers = int(config.get("i2i_num_triggers", 3))
        self.i2i_fusion = config.get("i2i_fusion", "concat")  # concat | interleave
        if self.i2i_fusion not in ("concat", "interleave"):
            raise ValueError(f"unknown i2i_fusion {self.i2i_fusion!r}")

        if item_index is None and config.get("item_index_path"):
            item_index = ItemIndex.load(config["item_index_path"])
        self.item_index = item_index

        import jax

        self._encode_jit = jax.jit(lambda variables, batch: self.model.encode_query(variables, batch))
        self._encode = lambda batch: self._encode_jit(self.variables, batch)
        self.timers: Dict[str, float] = {"feature": 0.0, "model": 0.0, "search": 0.0}
        # guards timer accumulation + lazy fused-program cache population
        # under multi-worker serving (MicroBatcher workers=2)
        self._state_lock = threading.Lock()

    def _tick(self, stage: str, dt: float) -> None:
        with self._state_lock:
            self.timers[stage] += dt

    # -- index lifecycle ----------------------------------------------------

    @property
    def item_index(self):
        return self._item_index

    @item_index.setter
    def item_index(self, idx):
        """Swapping in a refreshed corpus index drops every fused-program
        cache entry: the old entries' closures would otherwise pin the
        previous corpus arrays in HBM (~9 GB at 12.58M x 768 int8), and a
        reused id() could silently serve stale operands. A monotonic
        generation counter keys the cache instead of object identity."""
        self._item_index = idx
        self._index_gen = getattr(self, "_index_gen", 0) + 1
        self._fused = {}

    # -- feature hydration --------------------------------------------------

    def _feature_schema(self):
        """[(wire key, width)] + assembly plan, built once. Sequence features
        may be stored under '{seq}.{f}' or bare '{f}' — both keys decode into
        separate columns and merge by per-row presence."""
        if getattr(self, "_schema_cache", None) is not None:
            return self._schema_cache
        d = self.data_attr
        schema, plan = [], []
        widths = {}  # name -> column width already in the schema
        for feat in d.context_features:
            schema.append((feat, 1))
            widths[feat] = 1
            plan.append(("ctx", feat, feat, None))
        for seq_name, feats in (d.seq_features or {}).items():
            L = d.seq_lengths[seq_name]
            for f in feats:
                primary, alias = f"{seq_name}.{f}", f
                # two seqs may share a bare feature name: both reuse the
                # alias column as long as widths agree; a width conflict
                # (e.g. a context feature of the same name) drops that
                # lookup name for this seq feature rather than mis-shaping
                for name in (primary, alias):
                    if name not in widths:
                        schema.append((name, L))
                        widths[name] = L
                if widths[primary] != L:
                    logger.warning(
                        "feature key %r shadowed by an existing width-%d column "
                        "(need %d): stores writing %s.%s under that key will "
                        "serve zeros — rename the colliding feature",
                        primary, widths[primary], L, seq_name, f,
                    )
                    primary = None
                if widths[alias] != L:
                    logger.warning(
                        "bare feature key %r shadowed by an existing width-%d "
                        "column (need %d) for seq feature %s.%s: bare-name "
                        "storage for this feature will serve zeros",
                        alias, widths[alias], L, seq_name, f,
                    )
                    alias = None
                plan.append(("seq", seq_name, f, (primary, alias)))
        from nexus_tpu.inference.feature_store import StructBatchDecoder

        self._schema_cache = (StructBatchDecoder(schema), plan)
        return self._schema_cache

    def get_user_context_features(self, user_ids: List) -> Dict[str, np.ndarray]:
        """One mget round-trip -> native batch Struct decode -> fixed-shape
        [B]/[B, L] int64 columns (hot path: the reference spends its serving
        time here, base.py:448-507 get_features timers)."""
        t0 = time.perf_counter()
        keys = [self.user_key_template.format(u) for u in user_ids]
        blobs = self.kv.mget(keys)
        decoder, plan = self._feature_schema()
        cols, lens = decoder.decode_batch(blobs)
        batch: Dict[str, np.ndarray] = {}
        for kind, a, b, names in plan:
            if kind == "ctx":
                batch[b] = cols[b]
            else:
                seq_name, f = a, b
                primary, alias = names
                if primary is not None and alias is not None:
                    use_alias = (lens[primary] == 0)[:, None]
                    col = np.where(use_alias, cols[alias], cols[primary])
                elif primary is not None or alias is not None:
                    col = cols[primary if primary is not None else alias]
                else:  # both names shadowed by incompatible columns
                    L = self.data_attr.seq_lengths[seq_name]
                    col = np.zeros((len(user_ids), L), np.int64)
                batch.setdefault(seq_name, {})[f] = col
        self._tick("feature", time.perf_counter() - t0)
        return batch

    # -- retrieval ----------------------------------------------------------

    def batch_inference(self, user_ids: List, context: Optional[Dict] = None) -> Dict[str, np.ndarray]:
        """Returns {'user_id', 'item_ids' [B, K], 'scores' [B, K]}. Pass a
        precomputed ``context`` (the get_user_context_features dict) to skip
        hydration — the cascade service reuses one hydration across stages."""
        if self.retrieve_mode == "i2i":
            return self._i2i(user_ids)
        batch = context if context is not None else self.get_user_context_features(user_ids)
        bs = len(user_ids)
        # batch-size bucket: micro-batched serving boards arbitrary user
        # counts; compile one program per pow-2 bucket, not per count
        # (utils/buckets.py — remote compile storms measured otherwise)
        from nexus_tpu.utils.buckets import batch_bucket, pad_tree_rows

        padded_bs = batch_bucket(bs, cap=1024)
        if padded_bs != bs:
            batch = pad_tree_rows(batch, padded_bs)
        if not hasattr(self.item_index, "search_ops"):
            # duck-typed index (e.g. ShardedIVFIndex): separate encode +
            # index.search — the index runs its own compiled program
            t0 = time.perf_counter()
            q = np.asarray(self._encode(batch))[:bs]
            self._tick("model", time.perf_counter() - t0)
            t0 = time.perf_counter()
            scores, item_ids = self.item_index.search(q, self.output_topk)
            self._tick("search", time.perf_counter() - t0)
            return {"user_id": np.asarray(user_ids), "item_ids": item_ids, "scores": scores}
        t0 = time.perf_counter()
        scores, rows = self._fused_u2i(padded_bs)(batch)
        scores = np.asarray(scores)[:bs]  # host fetch = the dispatch boundary
        item_ids = self.item_index.item_ids[np.asarray(rows)[:bs]]
        # encode+search run as ONE compiled program (one device dispatch);
        # the reference's separate model/faiss timers collapse into 'model'
        self._tick("model", time.perf_counter() - t0)
        return {"user_id": np.asarray(user_ids), "item_ids": item_ids, "scores": scores}

    def batch_inference_stream(self, user_id_batches):
        """Pipelined u2i over a STREAM of request batches: the fused program
        for batch n is dispatched (async), batch n+1's mget+decode hydration
        runs on the host while the device crunches, and n's results are
        fetched only then — the KV round-trip hides behind device time
        (the double-buffered request pipeline; jax dispatch is async, so the
        overlap needs no threads). Yields the same dicts batch_inference
        returns, in order."""
        if self.retrieve_mode == "i2i" or not hasattr(self.item_index, "search_ops"):
            for user_ids in user_id_batches:  # non-fused paths: sequential
                yield self.batch_inference(user_ids)
            return
        pending = None  # (user_ids, device futures)
        for user_ids in user_id_batches:
            batch = self.get_user_context_features(user_ids)
            dispatched = (user_ids, self._fused_u2i(len(user_ids))(batch))
            if pending is not None:
                yield self._finish_u2i(*pending)
            pending = dispatched
        if pending is not None:
            yield self._finish_u2i(*pending)

    def _finish_u2i(self, user_ids, result) -> Dict[str, np.ndarray]:
        scores, rows = result
        t0 = time.perf_counter()
        scores = np.asarray(scores)  # blocks until the device finishes
        item_ids = self.item_index.item_ids[np.asarray(rows)]
        self._tick("model", time.perf_counter() - t0)
        return {"user_id": np.asarray(user_ids), "item_ids": item_ids, "scores": scores}

    def _fused_u2i(self, batch_size: int):
        """One jit program per batch size: query-tower encode -> metric prep
        -> index scan (index arrays as arguments, never jit constants).
        Keyed on the index GENERATION (bumped by the item_index setter,
        which also clears this cache) so a corpus refresh rebuilds the
        operand capture instead of serving — or pinning — stale arrays."""
        key = (batch_size, self.output_topk, self._index_gen,
               getattr(self.item_index, "topk_impl", "exact"))
        with self._state_lock:  # one worker installs each fused program
            cache = self._fused
            if key in cache:
                return cache[key]
            import jax
            import jax.numpy as jnp

            idx = self.item_index
            search_fn, operands = idx.search_ops(self.output_topk, batch_size)
            cosine = idx.metric == "cosine"

            @jax.jit
            def run(variables, batch, *ops):
                q = self.model.encode_query(variables, batch).astype(jnp.float32)
                if cosine:
                    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
                return search_fn(q, *ops)

            cache[key] = lambda batch: run(self.variables, batch, *operands)
            return cache[key]

    def _i2i(self, user_ids: List) -> Dict[str, np.ndarray]:
        """Trigger-item expansion from precomputed neighbor lists. The whole
        batch's trigger keys go through ONE deduplicated mget (the
        reference pipelines its GETs, base.py:248-268; a per-row get was the
        round-1 advisor finding)."""
        batch = self.get_user_context_features(user_ids)
        t0 = time.perf_counter()
        d = self.data_attr
        seq_name = sorted(d.seq_features or {})[0]
        triggers = batch[seq_name][d.fiid]  # [B, L]
        n_trig = self.i2i_num_triggers
        per_row = [[int(t) for t in row[row != 0][-n_trig:]] for row in triggers]
        uniq = list(dict.fromkeys(t for row in per_row for t in row))
        blobs = self.kv.mget([self.i2i_key_template.format(t) for t in uniq])
        neighbors = {
            t: [int(x) for x in blob.decode().split(",") if x] if blob else []
            for t, blob in zip(uniq, blobs)
        }
        out_ids = []
        for row in per_row:
            items: List[int] = []
            if self.i2i_fusion == "interleave":
                # round-robin across the triggers' (score-sorted) neighbor
                # lists: each trigger contributes its best candidates before
                # any trigger's tail — the multi-trigger fusion the
                # reference's per-trigger-truncate approximates
                lists = [neighbors[t] for t in row]
                for rank in range(max((len(l) for l in lists), default=0)):
                    for l in lists:
                        if rank < len(l):
                            items.append(l[rank])
            else:  # concat: trigger recency order, full lists in turn
                for trig in row:
                    items += neighbors[trig]
            seen = list(dict.fromkeys(items))[: self.output_topk]
            seen += [0] * (self.output_topk - len(seen))
            out_ids.append(seen)
        self._tick("search", time.perf_counter() - t0)
        ids = np.asarray(out_ids)
        return {
            "user_id": np.asarray(user_ids),
            "item_ids": ids,
            "scores": np.zeros_like(ids, np.float32),
        }


def _cli():
    """Serving CLI (parity: Nexus/inference/embedder/recommendation/
    __main__.py / __tde_main__.py): build the engine from a JSON/YAML config
    (feature_cache -> redis or memory; item_index_path; --tde wraps the
    engine with the restored id transformer) and run batch u2i/i2i inference.

        python -m nexus_tpu.inference.embedder.recommendation \
            --config infer_config.json --users 1 2 3 [--tde]
    """
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="engine config (.json/.yaml)")
    ap.add_argument("--users", nargs="+", type=int, required=True)
    ap.add_argument("--tde", action="store_true",
                    help="TDE engine: config must carry tde_features")
    ns = ap.parse_args()
    if ns.config.endswith((".yaml", ".yml")):
        import yaml

        with open(ns.config) as f:
            config = yaml.safe_load(f)
    else:
        with open(ns.config) as f:
            config = json.load(f)
    if ns.tde:
        from nexus_tpu.inference.tde_engine import TDEEmbedderInferenceEngine as Engine
    else:
        Engine = BaseEmbedderInferenceEngine
    engine = Engine(config)
    out = engine.batch_inference(ns.users)
    for uid, items in zip(out["user_id"], out["item_ids"]):
        print(int(uid), "->", [int(i) for i in items])
    print("stage timers:", {k: round(v, 4) for k, v in engine.timers.items()})


if __name__ == "__main__":
    _cli()
