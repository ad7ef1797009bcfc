"""Text-embedder training arguments (parity: Nexus/training/embedder/
text_retrieval/arguments.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from nexus_tpu.config import AbsArguments


@dataclass
class TextEmbedderModelArguments(AbsArguments):
    model_name_or_path: str = ""
    sentence_pooling_method: str = "cls"  # cls | mean | last_token
    normalize_embeddings: bool = True
    temperature: float = 0.02
    negatives_cross_device: bool = True  # under SPMD pjit this IS in-batch over the global batch
    kd_loss_type: str = "kl_div"  # kl_div | m3_kd_loss
    sub_batch_size: Optional[int] = None
    dtype: str = "bfloat16"  # compute dtype on TPU
    gradient_checkpointing: bool = False  # remat the layer scan (reference default for fine-tunes)
    remat_policy: Optional[str] = None  # None = full remat | 'dots' = save matmul
    # outputs | 'offload_dots' = park matmul outputs in host RAM (models/bert.py)
    remat_plain_layers: int = 0  # partial remat: last k layers skip remat
    attention_impl: str = "auto"  # auto | xla | pallas (flash kernel; the
    # flash-attn-2 parity for long-seq training — O(L) memory fwd AND bwd)
    # | fused (ops/fused_encoder.py megakernel — fastest encode; in training
    # it engages only when both dropouts are 0, else falls back to flash)


@dataclass
class TextEmbedderDataArguments(AbsArguments):
    train_data: Optional[List[str]] = None
    train_group_size: int = 8
    query_max_len: int = 512
    passage_max_len: int = 512
    query_instruction_for_retrieval: Optional[str] = None
    query_instruction_format: str = "{}{}"
    passage_instruction_for_retrieval: Optional[str] = None
    passage_instruction_format: str = "{}{}"
    knowledge_distillation: bool = False
    no_in_batch_neg_flag: bool = False
    shuffle_ratio: float = 0.0  # text-shuffle augmentation probability
    same_dataset_within_batch: bool = False
    small_threshold: int = 0
    drop_threshold: int = 0
    # sequence packing (ops/packing.py): pack ragged tokenized batches into
    # dense fixed-length rows with block-diagonal segment attention — no
    # padding waste on real-data fine-tunes (BENCH_NOTES.md measured ~1.6x)
    pack_sequences: bool = False
    pack_row_len: int = 512  # packed row length (MXU-friendly multiple of 128)
    pack_row_bucket: int = 8  # row counts round up to this (bounded compile set)
