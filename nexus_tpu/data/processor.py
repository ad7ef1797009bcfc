"""Data config processing: file-level train/test split + model-facing schema
(parity: Nexus/training/reranker/recommendation/dataset.py:271-304 and the
DataArguments schema in training/*/recommendation/arguments.py).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

from nexus_tpu.config import AbsArguments
from nexus_tpu.data.attrs import DataAttr4Model, Statistics
from nexus_tpu.data.clients import get_client


@dataclass
class DataArguments(AbsArguments):
    """Dataset description config (recflow-style)."""

    name: str = None
    type: str = "file"
    url: str = None
    file_partition: Dict[str, str] = None
    item_col: str = None
    context_features: List[str] = None
    item_features: List[str] = None
    labels: List[str] = None
    stats: Dict[str, int] = None
    user_sequential_info: Optional[List[Dict[str, Any]]] = None
    train_period: Dict[str, str] = None
    test_period: Dict[str, str] = None
    filter_settings: Optional[Dict[str, Any]] = None
    item_info: Optional[Dict[str, Any]] = None
    item_batch_size: int = 2048
    files: Optional[List[str]] = None
    item_pop_dict_path: Optional[str] = None

    def to_attr(self) -> DataAttr4Model:
        """Derive the model-facing schema (DataAttr4Model) from this config."""
        stats = Statistics.from_dict(dict(self.stats))
        seq_feats, seq_lens = {}, {}
        for info in self.user_sequential_info or []:
            seq_feats[info["name"]] = list(info.get("use_cols") or info["columns"])
            seq_lens[info["name"]] = int(info.get("length", 50))
        num_items = int(self.stats[self.item_col])
        return DataAttr4Model(
            fiid=self.item_col,
            flabels=list(self.labels),
            features=list(self.context_features) + list(self.item_features),
            context_features=list(self.context_features),
            item_features=list(self.item_features),
            seq_features=seq_feats,
            seq_lengths=seq_lens,
            num_items=num_items,
            stats=stats,
        )


class ConfigProcessor:
    """Split a data config into train/eval configs at file level by date."""

    def __init__(self, config: Union[dict, str, DataArguments]):
        if isinstance(config, DataArguments):
            self.config = config
        elif isinstance(config, dict):
            self.config = DataArguments.from_dict(config)
        elif isinstance(config, str):
            self.config = DataArguments.from_file(config)
        else:
            raise TypeError("config must be a dict, path, or DataArguments")

    def split_config(self) -> Tuple[DataArguments, DataArguments]:
        client = get_client(self.config.type, self.config.url)
        train_files, eval_files = client.get_train_eval_filenames(
            self.config.file_partition, self.config.train_period, self.config.test_period
        )
        train_cfg = copy.deepcopy(self.config)
        eval_cfg = copy.deepcopy(self.config)
        train_cfg.files = train_files
        eval_cfg.files = eval_files
        return train_cfg, eval_cfg
