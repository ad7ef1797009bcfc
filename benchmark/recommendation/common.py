"""Shared benchmark utilities: ensure the synthetic recflow dataset exists
(stands in for the real recflow download; same schema/config layout as
/root/reference/benchmark/recommendation/DCN_V2/data_recflow_config.json).
"""

from __future__ import annotations

import os

DATA_ROOT = os.environ.get("NEXUS_BENCH_DATA", "/tmp/nexus_bench_data")


def ensure_synthetic_dataset(n_days: int = 4, rows_per_day: int = 8192, seq_len: int = 20) -> str:
    cfg = os.path.join(DATA_ROOT, "data_config.json")
    if not os.path.exists(cfg):
        from nexus_tpu.data.synthetic import generate_synthetic_recflow

        cfg = generate_synthetic_recflow(
            DATA_ROOT, n_days=n_days, rows_per_day=rows_per_day, seq_len=seq_len
        )
    return cfg
