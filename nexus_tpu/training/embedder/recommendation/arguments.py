"""Retriever model arguments (parity: Nexus/training/embedder/recommendation/
arguments.py ModelArguments)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from nexus_tpu.config import AbsArguments


@dataclass
class ModelArguments(AbsArguments):
    embedding_dim: int = 10
    mlp_layers: Optional[List[int]] = None
    num_neg: int = 50
    activation: str = "relu"
    dropout: float = 0.3
    batch_norm: bool = True
    model_name_or_path: str = ""
    topk: int = 10
    # SASRec encoder
    n_layers: int = 1
    n_heads: int = 4
    hidden_size: int = 512
    # sampler selection (overrides the model's default when set)
    sampler: Optional[str] = None
    num_clusters: int = 8
