"""Dataset attribute descriptors (parity: Nexus/modules/arguments.py:8-105).

`Statistics` holds per-feature cardinalities; `DataAttr4Model` carries the
schema a model needs at init time (feature names, sequence layouts, label
columns, num_items). Both round-trip through dicts so they can be embedded in
model_config.json checkpoints exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class Statistics:
    """Per-feature cardinalities, attribute-per-feature like the reference."""

    columns: List[str] = field(default_factory=list)

    @staticmethod
    def from_dict(d: dict) -> "Statistics":
        stat = Statistics()
        for k, v in d.items():
            if k == "columns":
                continue
            setattr(stat, k, v)
            stat.columns.append(k)
        return stat

    def to_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.columns}


@dataclass
class DataAttr4Model:
    """Schema description handed to models at construction time."""

    fiid: str = None  # item-id column name
    flabels: List[str] = None  # label column names (multi-task: several)
    features: List[str] = None
    context_features: List[str] = None
    item_features: List[str] = None
    seq_features: Dict[str, List[str]] = None  # seq name -> member feature names
    seq_lengths: Dict[str, int] = None  # seq name -> fixed max length
    num_items: int = 0
    stats: Statistics = None

    @staticmethod
    def from_dict(d: dict) -> "DataAttr4Model":
        d = dict(d)
        if isinstance(d.get("stats"), dict):
            d["stats"] = Statistics.from_dict(d["stats"])
        return DataAttr4Model(**d)

    def to_dict(self) -> dict:
        d = dict(self.__dict__)
        if isinstance(d.get("stats"), Statistics):
            d["stats"] = d["stats"].to_dict()
        return d
