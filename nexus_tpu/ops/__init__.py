"""TPU compute ops: Pallas kernels and XLA-optimized primitives."""

from nexus_tpu.ops.kmeans import kmeans  # noqa: F401
from nexus_tpu.ops.ring_attention import ring_attention  # noqa: F401
from nexus_tpu.ops.topk import brute_force_topk, topk_over_corpus  # noqa: F401
