"""Recommendation ranker serving engine (parity: Nexus/inference/reranker/
recommendation/base.py:71-616): hydrate user context + per-candidate item
features from the KV store, score all candidates with the compiled ranker,
return top-k item ids.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import numpy as np

from nexus_tpu.inference.feature_store import FeatureCache, FeatureCodec, get_kv_store
from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.inference.rec_reranker")


class BaseRerankerInferenceEngine:
    def __init__(self, config: dict, kv_store=None):
        from nexus_tpu.training.checkpoint import load_checkpoint

        self.config = config
        self.model, self.variables = load_checkpoint(config["model_ckpt_path"])
        self.data_attr = self.model.data_config
        self.output_topk = int(config.get("output_topk", 10))
        self.kv = kv_store or get_kv_store(config.get("feature_cache"))
        self.feature_cache = FeatureCache(self.kv, FeatureCodec())
        fc = config.get("feature_cache") or {}
        self.user_key_template = fc.get("user_key_template", "user:{}")
        self.item_key_template = fc.get("item_key_template", "item:{}")
        self.timers: Dict[str, float] = {"feature": 0.0, "model": 0.0}
        # guards timers + lazy jit caches under multi-worker serving (the
        # borrowed hydration method below calls self._tick too)
        self._state_lock = threading.Lock()
        # reuse the embedder engine's hydration logic for user/context features
        from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine

        self._hydrate_user = BaseEmbedderInferenceEngine.get_user_context_features.__get__(self)
        self._feature_schema = BaseEmbedderInferenceEngine._feature_schema.__get__(self)

    def _tick(self, stage: str, dt: float) -> None:
        with self._state_lock:
            self.timers[stage] += dt

    def get_candidates_features(self, candidate_ids: np.ndarray) -> Dict[str, np.ndarray]:
        """[B, N] candidate ids -> {item_feat: [B, N]}: one mget + native
        batch Struct decode (parity: the reference's per-candidate Redis
        hydration, reranker base.py:189-227; B*N rows make the native path
        matter even more than the user side)."""
        t0 = time.perf_counter()
        b, n = candidate_ids.shape
        flat = candidate_ids.reshape(-1)
        blobs = self.kv.mget([self.item_key_template.format(v) for v in flat.tolist()])
        if getattr(self, "_item_decoder", None) is None:
            from nexus_tpu.inference.feature_store import StructBatchDecoder

            self._item_decoder = StructBatchDecoder(
                [(feat, 1) for feat in self.data_attr.item_features]
            )
        cols, _ = self._item_decoder.decode_batch(blobs)
        out = {feat: cols[feat].reshape(b, n) for feat in self.data_attr.item_features}
        self._tick("feature", time.perf_counter() - t0)
        return out

    def batch_inference(
        self, user_ids: List, candidates: Dict[str, np.ndarray] | np.ndarray,
        context: Optional[Dict] = None,
    ) -> Dict[str, np.ndarray]:
        """Rank candidates per user. `candidates` is either {feat: [B, N]}
        or a [B, N] id matrix hydrated from the KV store. A precomputed
        ``context`` dict skips the second user-feature round-trip when the
        retriever stage already hydrated the same users."""
        if context is None:
            context = self._hydrate_user(user_ids)
        raw_ids = None
        if not isinstance(candidates, dict):
            # echo the REQUESTED ids in the output — the hydrated id column
            # reads 0 for items missing from the store
            raw_ids = np.asarray(candidates)
            candidates = self.get_candidates_features(raw_ids)
        # batch-size bucket (utils/buckets.py): micro-batched serving boards
        # arbitrary user counts — pad to a pow-2 bucket so the jit cache
        # holds log2(max) programs, not one per boarded size
        from nexus_tpu.utils.buckets import batch_bucket, pad_tree_rows

        bs = len(user_ids)
        padded_bs = batch_bucket(bs, cap=1024)
        if padded_bs != bs:
            context = pad_tree_rows(context, padded_bs)
            candidates = pad_tree_rows(candidates, padded_bs)
        t0 = time.perf_counter()
        # ONE compiled program per (batch, n_cand) shape AND topk: eager
        # predict dispatches dozens of ops, each paying full device-call
        # latency (~25 ms on the relay — measured 940 ms/request un-jitted)
        topk = self.output_topk
        with self._state_lock:  # one worker installs each predict program
            cache = self.__dict__.setdefault("_predict_cache", {})
            if topk not in cache:
                import jax

                cache[topk] = jax.jit(
                    lambda variables, ctx, cand: self.model.predict(
                        variables, ctx, cand, topk=topk
                    )
                )
            fn = cache[topk]
        topk_idx = np.asarray(fn(self.variables, context, candidates))[:bs]
        self._tick("model", time.perf_counter() - t0)
        fiid = self.data_attr.fiid
        cand_ids = (raw_ids if raw_ids is not None
                    else np.asarray(candidates[fiid])[:bs])
        item_ids = np.take_along_axis(cand_ids, topk_idx, axis=1)
        return {"user_id": np.asarray(user_ids), "item_ids": item_ids, "topk_idx": topk_idx}


def _cli():
    """Ranker serving CLI (parity: Nexus/inference/reranker/recommendation/
    __main__.py / __tde_main__.py): build the engine from a JSON/YAML config
    and score candidate ids for users.

        python -m nexus_tpu.inference.reranker.recommendation \
            --config infer_config.json --users 1 2 --candidates 5 9 13 [--tde]
    """
    import argparse
    import json

    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--users", nargs="+", type=int, required=True)
    ap.add_argument("--candidates", nargs="+", type=int, required=True,
                    help="candidate item ids (same list scored for each user)")
    ap.add_argument("--tde", action="store_true")
    ns = ap.parse_args()
    if ns.config.endswith((".yaml", ".yml")):
        import yaml

        with open(ns.config) as f:
            config = yaml.safe_load(f)
    else:
        with open(ns.config) as f:
            config = json.load(f)
    if ns.tde:
        from nexus_tpu.inference.tde_engine import TDERerankerInferenceEngine as Engine
    else:
        Engine = BaseRerankerInferenceEngine
    engine = Engine(config)
    cands = np.tile(np.asarray(ns.candidates)[None, :], (len(ns.users), 1))
    out = engine.batch_inference(ns.users, cands)
    for uid, items in zip(out["user_id"], out["item_ids"]):
        print(int(uid), "->", [int(i) for i in items])


if __name__ == "__main__":
    _cli()
