"""Ranker model arguments (parity: Nexus/training/reranker/recommendation/
arguments.py ModelArguments + per-model extensions used in benchmark/)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from nexus_tpu.config import AbsArguments


@dataclass
class ModelArguments(AbsArguments):
    embedding_dim: int = 10
    mlp_layers: Optional[List[int]] = None
    prediction_layers: Optional[List[int]] = None
    activation: str = "relu"
    dropout: float = 0.3
    batch_norm: bool = True
    model_name_or_path: str = ""
    topk: int = 10
    # DCNv2
    cross_net_layers: int = 4
    deep_cross_combination: str = "parallel"  # 'parallel' | 'stacked'
    # MMoE
    n_experts: int = 3
    gate_layers: Optional[List[int]] = None
    tower_layers: Optional[List[int]] = None
    # sequence encoder choice for base rankers
    seq_aggregator: str = "average"
    din_hidden_size: int = 36
