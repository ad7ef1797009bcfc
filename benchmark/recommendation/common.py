"""Shared benchmark drivers: dataset bootstrap + the train/eval/infer matrix
every model dir runs (parity: the reference's per-model
train.py/eval.py/infer.py/insert_redis.py file sets, e.g.
/root/reference/benchmark/recommendation/DIN/ — 17 files per dir; here the
drivers are shared and each dir stays thin).

NEXUS_BENCH_FAST=1 shrinks the synthetic dataset + epochs for smoke runs.
"""

from __future__ import annotations

import json
import os

DATA_ROOT = os.environ.get("NEXUS_BENCH_DATA", "/tmp/nexus_bench_data")
FAST = os.environ.get("NEXUS_BENCH_FAST") == "1"

if os.environ.get("NEXUS_BENCH_CPU") == "1":
    # sitecustomize pre-registers the TPU relay and ignores JAX_PLATFORMS;
    # the config update is the reliable CPU override (smoke runs must not
    # contend with benchmark jobs for the one chip)
    import jax

    jax.config.update("jax_platforms", "cpu")


def ensure_synthetic_dataset(n_days: int = 4, rows_per_day: int = 8192, seq_len: int = 20,
                             labels=None, root: str = None) -> str:
    if FAST:
        n_days, rows_per_day, seq_len = 2, 512, 6
    root = root or (DATA_ROOT + ("_multi" if labels else ""))
    cfg = os.path.join(root, "data_config.json")
    if not os.path.exists(cfg):
        from nexus_tpu.data.synthetic import generate_synthetic_recflow

        kw = {"labels": labels} if labels else {}
        cfg = generate_synthetic_recflow(
            root, n_days=n_days, rows_per_day=rows_per_day, seq_len=seq_len, **kw
        )
    return cfg


def load_dir_configs(here: str):
    """(model_config, training_config) from the model dir's json files."""
    with open(os.path.join(here, "model_config.json")) as f:
        model_cfg = json.load(f)
    with open(os.path.join(here, "training_config.json")) as f:
        train_cfg = json.load(f)
    if FAST:
        train_cfg = {**train_cfg, "num_train_epochs": 1,
                     "per_device_train_batch_size": 64, "logging_steps": 2}
    return model_cfg, train_cfg


def train_ranker(model_class, here: str, labels=None):
    from nexus_tpu.training.reranker.recommendation import RankerRunner

    model_cfg, train_cfg = load_dir_configs(here)
    runner = RankerRunner(
        model_config_or_path=model_cfg,
        data_config_or_path=ensure_synthetic_dataset(labels=labels),
        train_config_or_path=train_cfg,
        model_class=model_class,
    )
    runner.run()
    return runner


def train_retriever(model_class, here: str):
    from nexus_tpu.training.embedder.recommendation import RetrieverRunner

    model_cfg, train_cfg = load_dir_configs(here)
    runner = RetrieverRunner(
        model_config_or_path=model_cfg,
        data_config_or_path=ensure_synthetic_dataset(),
        train_config_or_path=train_cfg,
        model_class=model_class,
    )
    runner.run()
    return runner


def eval_model(here: str, kind: str, labels=None):
    """Offline eval from the dir's trained checkpoint (parity: eval.py +
    eval_config.json): ranker -> auc/logloss, retriever -> ndcg/recall."""
    from nexus_tpu.evaluation.recommendation.evaluator import RecommenderEvalRunner

    _, train_cfg = load_dir_configs(here)
    ckpt = train_cfg["output_dir"]
    data_config = ensure_synthetic_dataset(labels=labels)
    if kind == "ranker":
        runner = RecommenderEvalRunner(data_config, ranker_ckpt_path=ckpt,
                                       metrics=["auc", "logloss"])
    else:
        runner = RecommenderEvalRunner(data_config, retriever_ckpt_path=ckpt,
                                       metrics=["ndcg", "recall"], cutoffs=[10, 50])
    out = runner.run()
    print(json.dumps(out, default=lambda x: round(float(x), 5)))
    return out


def _populate_feature_store(data_config: str):
    """In-process feature store fill (parity: insert_redis.py)."""
    from nexus_tpu.data.dataset import ShardedDataset
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.inference.feature_store import FeatureCache, MemoryKVStore

    train_cfg, _ = ConfigProcessor(data_config).split_config()
    kv = MemoryKVStore()
    cache = FeatureCache(kv)
    ds = ShardedDataset(train_cfg, batch_size=512, drop_last=False)
    for batch in ds:
        nv = int(batch.pop("_nvalid", len(batch["user_id"])))
        seq_names = [k for k, v in batch.items() if isinstance(v, dict)]
        for i in range(nv):
            row = {f: int(batch[f][i]) for f in train_cfg.context_features}
            for sn in seq_names:
                for f, mat in batch[sn].items():
                    row[f"{sn}.{f}"] = [int(x) for x in mat[i]]
            kv.set(f"user:{row['user_id']}", cache.codec.encode(row))
    return kv, train_cfg


def infer_retriever(here: str, topk: int = 10):
    """u2i serving round-trip: feature store -> encode -> IVF search
    (parity: infer.py over infer_config.yaml)."""
    import numpy as np

    from nexus_tpu.inference.embedder.recommendation import BaseEmbedderInferenceEngine
    from nexus_tpu.inference.index import ItemIndex

    _, train_cfg = load_dir_configs(here)
    ckpt = train_cfg["output_dir"]
    data_config = ensure_synthetic_dataset()
    kv, _ = _populate_feature_store(data_config)
    iv = np.load(os.path.join(ckpt, "item_vectors.npy"))
    index = ItemIndex.build(iv, index_type="ivf", nlist=min(100, len(iv)), nprobe=10)
    engine = BaseEmbedderInferenceEngine(
        {"model_ckpt_path": ckpt, "retrieve_mode": "u2i", "output_topk": topk},
        kv_store=kv, item_index=index,
    )
    users = [int(k.split(b":" if isinstance(k, bytes) else ":")[1]) for k in kv.keys("user:*")[:16]]
    out = engine.batch_inference(users)
    print("topk items for first user:", out["item_ids"][0].tolist())
    print("stage timers:", {k: round(v, 4) for k, v in engine.timers.items()})
    return out


def infer_ranker(here: str, topk: int = 5, labels=None):
    """Ranker serving: feature hydration + candidate scoring
    (parity: reranker infer.py)."""
    import numpy as np

    from nexus_tpu.inference.reranker.recommendation import BaseRerankerInferenceEngine

    from nexus_tpu.data.dataset import ItemDataset
    from nexus_tpu.data.processor import ConfigProcessor

    _, train_cfg = load_dir_configs(here)
    ckpt = train_cfg["output_dir"]
    data_config = ensure_synthetic_dataset(labels=labels)
    kv, cfg = _populate_feature_store(data_config)
    engine = BaseRerankerInferenceEngine(
        {"model_ckpt_path": ckpt, "output_topk": topk}, kv_store=kv,
    )
    users = [int(k.split(b":" if isinstance(k, bytes) else ":")[1]) for k in kv.keys("user:*")[:8]]
    rng = np.random.default_rng(0)
    # candidates carry ALL item features (hydrated from the dense item table)
    table = ItemDataset(ConfigProcessor(data_config).split_config()[0]).item_feature_table()
    attr = cfg.to_attr()
    cand_ids = rng.integers(1, attr.num_items, (len(users), 20))
    candidates = {f: table[f][cand_ids] for f in attr.item_features}
    out = engine.batch_inference(users, candidates)
    print("ranked candidates for first user:", out["item_ids"][0].tolist())
    return out
