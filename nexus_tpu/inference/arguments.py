"""Inference arguments (parity: Nexus/abc/inference/arguments.py:8-71
AbsInferenceArguments). The ONNX/TRT-specific fields map to their AOT
equivalents: onnx/trt paths -> serialized-executable path, max_workspace_size
-> (n/a, XLA manages memory), infer_mode 'onnx'/'tensorrt' -> AOT sessions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from nexus_tpu.config import AbsArguments


@dataclass
class InferenceArguments(AbsArguments):
    stage: Optional[str] = None  # 'retrieve' | 'rank' (cascade position)
    model_name_or_path: str = ""
    use_fp16: bool = True  # maps to bf16 compute on TPU
    infer_device: Optional[str] = None  # TPU devices are mesh-managed
    infer_mode: str = "normal"  # normal | aot (onnx/tensorrt accepted as aliases)
    infer_batch_size: int = 256
    output_topk: int = 10
    normalize: bool = True
    query_max_length: int = 512
    passage_max_length: int = 512
    # serialized-executable export path (the onnx/trt file-path parity fields)
    serialized_model_path: Optional[str] = None
    onnx_model_path: Optional[str] = None  # accepted alias
    trt_model_path: Optional[str] = None  # accepted alias
    seq_buckets: List[int] = field(default_factory=lambda: [32, 64, 128, 256, 512])

    def __post_init__(self):
        if self.infer_mode in ("onnx", "tensorrt", "trt"):
            self.infer_mode = "aot"
        if self.serialized_model_path is None:
            self.serialized_model_path = self.onnx_model_path or self.trt_model_path


AbsInferenceArguments = InferenceArguments  # reference-name alias
