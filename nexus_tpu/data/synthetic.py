"""Synthetic recflow-schema dataset generator.

Produces a small on-disk dataset with the exact layout the real industrial
pipeline consumes (daily parquet interaction files + daily user-sequence side
tables + an item-info table + a JSON data config), so tests, examples and
benchmarks run the REAL data path end-to-end without the recflow download.
Schema mirrors /root/reference/benchmark/recommendation/DCN_V2/
data_recflow_config.json.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_STATS = {
    "user_id": 500,
    "device_id": 60,
    "age": 8,
    "gender": 3,
    "province": 30,
    "video_id": 2000,
    "author_id": 800,
    "category_level_one": 20,
    "category_level_two": 50,
    "upload_type": 10,
}

CONTEXT_FEATURES = ["user_id", "device_id", "age", "gender", "province"]
ITEM_FEATURES = ["video_id", "author_id", "category_level_two", "upload_type", "category_level_one"]
SEQ_USE_COLS = ["video_id", "author_id", "category_level_two", "category_level_one", "upload_type"]


def generate_synthetic_recflow(
    root: str,
    n_days: int = 3,
    rows_per_day: int = 2048,
    seq_len: int = 10,
    stats: Optional[dict] = None,
    labels=("effective_view",),
    start_date: str = "2024-01-01",
    seed: int = 0,
) -> str:
    """Write the synthetic dataset under ``root``; returns the path of the
    generated data config JSON. Train period covers all but the last day."""
    stats = dict(stats or DEFAULT_STATS)
    rng = np.random.default_rng(seed)
    day0 = datetime.strptime(start_date, "%Y-%m-%d")

    main_dir = os.path.join(root, "realshow")
    seq_dir = os.path.join(root, "seq_effective")
    item_dir = os.path.join(root, "item_info")
    for d in (main_dir, seq_dir, item_dir):
        os.makedirs(d, exist_ok=True)

    # item feature table: one row per item id (id 0 = padding)
    n_items = stats["video_id"]
    item_cols = {
        "video_id": np.arange(n_items, dtype=np.int64),
        "author_id": rng.integers(1, stats["author_id"], n_items),
        "category_level_two": rng.integers(1, stats["category_level_two"], n_items),
        "upload_type": rng.integers(1, stats["upload_type"], n_items),
        "category_level_one": rng.integers(1, stats["category_level_one"], n_items),
    }
    for c in ITEM_FEATURES[1:]:
        item_cols[c][0] = 0
    pq.write_table(pa.table({k: pa.array(v) for k, v in item_cols.items()}),
                   os.path.join(item_dir, "items.parquet"))

    def item_feats_of(video_ids: np.ndarray) -> dict:
        return {c: item_cols[c][video_ids] for c in ITEM_FEATURES}

    request_counter = 0
    for day in range(n_days):
        token = (day0 + timedelta(days=day)).strftime("%Y-%m-%d")
        n = rows_per_day
        request_ids = np.arange(request_counter, request_counter + n, dtype=np.int64)
        request_counter += n
        # popularity-skewed item draws (zipf-ish) for realistic samplers
        vid = np.minimum((rng.pareto(1.2, n) * 30).astype(np.int64) + 1, n_items - 1)
        main = {
            "request_id": request_ids,
            "user_id": rng.integers(1, stats["user_id"], n),
            "device_id": rng.integers(1, stats["device_id"], n),
            "age": rng.integers(1, stats["age"], n),
            "gender": rng.integers(1, stats["gender"], n),
            "province": rng.integers(1, stats["province"], n),
            **item_feats_of(vid),
        }
        # label correlated with (user_id + video_id) parity so models can learn
        logits = (
            0.8 * np.sin(main["user_id"] * 0.1)
            + 0.8 * np.cos(vid * 0.05)
            + 0.4 * (main["age"] > 4)
            - 0.3
        )
        p = 1.0 / (1.0 + np.exp(-logits))
        for lbl in labels:
            main[lbl] = (rng.uniform(size=n) < p).astype(np.int64)
            p = np.clip(p * 0.6, 0.01, 0.99)  # secondary tasks rarer, correlated
        pq.write_table(pa.table({k: pa.array(v) for k, v in main.items()}),
                       os.path.join(main_dir, f"{token}.parquet"))

        # user behavior sequences keyed by request_id, fixed-size list columns
        hist = np.minimum((rng.pareto(1.2, (n, seq_len)) * 30).astype(np.int64) + 1, n_items - 1)
        lengths = rng.integers(1, seq_len + 1, n)
        mask = np.arange(seq_len)[None, :] < lengths[:, None]
        hist = np.where(mask, hist, 0)
        seq_cols = {"request_id": pa.array(request_ids)}
        for c in SEQ_USE_COLS:
            vals = item_cols[c][hist] * (hist != 0)
            seq_cols[c] = pa.FixedSizeListArray.from_arrays(
                pa.array(vals.reshape(-1)), seq_len
            )
        pq.write_table(pa.table(seq_cols), os.path.join(seq_dir, f"{token}.parquet"))

    train_end = (day0 + timedelta(days=max(n_days - 1, 1))).strftime("%Y-%m-%d")
    test_end = (day0 + timedelta(days=n_days)).strftime("%Y-%m-%d")
    config = {
        "name": "synthetic_recflow",
        "type": "file",
        "url": main_dir,
        "file_partition": {"type": "date", "format": "%Y-%m-%d"},
        "item_col": "video_id",
        "context_features": CONTEXT_FEATURES,
        "item_features": ITEM_FEATURES,
        "labels": list(labels),
        "user_sequential_info": [
            {
                "name": "seq_effective",
                "url": seq_dir,
                "key": "request_id",
                "columns": SEQ_USE_COLS,
                "use_cols": SEQ_USE_COLS,
                "length": seq_len,
            }
        ],
        "item_info": {
            "url": item_dir,
            "key": "video_id",
            "columns": ITEM_FEATURES,
            "use_cols": ITEM_FEATURES,
        },
        "stats": stats,
        "train_period": {"start_date": start_date, "end_date": train_end},
        "test_period": {"start_date": train_end, "end_date": test_end},
    }
    cfg_path = os.path.join(root, "data_config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)
    return cfg_path


KUAIRAND_STATS = {
    "day_of_week": 7,
    "hour_of_day": 24,
    "user_id": 400,
    "user_active_degree": 9,
    "follow_user_num_range": 8,
    "register_days_range": 8,
    "video_id": 1500,
    "author_id": 600,
    "video_type": 3,
    "upload_type": 14,
    "music_type": 5,
    "tag": 64,
}

KUAIRAND_CONTEXT = ["day_of_week", "hour_of_day", "user_id", "user_active_degree",
                    "follow_user_num_range", "register_days_range"]
KUAIRAND_ITEM = ["video_id", "author_id", "video_type", "upload_type",
                 "music_type", "tag"]


def generate_synthetic_kuairand(
    root: str,
    n_days: int = 4,
    rows_per_day: int = 4096,
    stats: Optional[dict] = None,
    start_date: str = "2022-04-09",
    seed: int = 7,
) -> str:
    """KuaiRand-Pure-shaped synthetic dataset (schema mirrors /root/reference/
    benchmark/recommendation/DSSM/data_kuairand_pure_config.json): pure
    context+item features with NO user-sequence side tables
    (``user_sequential_info: []``) and an ``is_click`` label — the second
    config shape the reference's DSSM benchmark exercises."""
    stats = dict(stats or KUAIRAND_STATS)
    rng = np.random.default_rng(seed)
    day0 = datetime.strptime(start_date, "%Y-%m-%d")

    main_dir = os.path.join(root, "kuairand")
    item_dir = os.path.join(root, "item_info")
    for d in (main_dir, item_dir):
        os.makedirs(d, exist_ok=True)

    n_items = stats["video_id"]
    item_cols = {"video_id": np.arange(n_items, dtype=np.int64)}
    for c in KUAIRAND_ITEM[1:]:
        item_cols[c] = rng.integers(1, stats[c], n_items)
        item_cols[c][0] = 0
    pq.write_table(pa.table({k: pa.array(v) for k, v in item_cols.items()}),
                   os.path.join(item_dir, "video_basic.parquet"))

    for day in range(n_days):
        token = (day0 + timedelta(days=day)).strftime("%Y-%m-%d")
        n = rows_per_day
        vid = np.minimum((rng.pareto(1.2, n) * 25).astype(np.int64) + 1, n_items - 1)
        main = {
            "day_of_week": np.full(n, day % 7, np.int64),
            "hour_of_day": rng.integers(0, stats["hour_of_day"], n),
            "user_id": rng.integers(1, stats["user_id"], n),
            "user_active_degree": rng.integers(1, stats["user_active_degree"], n),
            "follow_user_num_range": rng.integers(1, stats["follow_user_num_range"], n),
            "register_days_range": rng.integers(1, stats["register_days_range"], n),
            **{c: item_cols[c][vid] for c in KUAIRAND_ITEM},
        }
        logits = (0.8 * np.sin(main["user_id"] * 0.13)
                  + 0.8 * np.cos(vid * 0.07)
                  + 0.3 * (main["user_active_degree"] > 4) - 0.2)
        p = 1.0 / (1.0 + np.exp(-logits))
        main["is_click"] = (rng.uniform(size=n) < p).astype(np.int64)
        pq.write_table(pa.table({k: pa.array(v) for k, v in main.items()}),
                       os.path.join(main_dir, f"{token}.parquet"))

    train_end = (day0 + timedelta(days=max(n_days - 1, 1))).strftime("%Y-%m-%d")
    test_end = (day0 + timedelta(days=n_days)).strftime("%Y-%m-%d")
    config = {
        "name": "synthetic_kuairand",
        "type": "file",
        "url": main_dir,
        "file_partition": {"type": "date", "format": "%Y-%m-%d"},
        "item_col": "video_id",
        "context_features": KUAIRAND_CONTEXT,
        "item_features": KUAIRAND_ITEM,
        "labels": ["is_click"],
        "user_sequential_info": [],
        "item_info": {
            "url": item_dir,
            "key": "video_id",
            "columns": KUAIRAND_ITEM,
            "use_cols": KUAIRAND_ITEM,
        },
        "stats": stats,
        "train_period": {"start_date": start_date, "end_date": train_end},
        "test_period": {"start_date": train_end, "end_date": test_end},
    }
    cfg_path = os.path.join(root, "data_config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)
    return cfg_path
