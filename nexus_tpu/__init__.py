"""nexus_tpu — a TPU-native information-retrieval framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Nexus
information-retrieval toolkit (recommendation, text retrieval, multimodal
retrieval across training / inference / evaluation / serving), built for
TPU hardware:

- compute path: jit/pjit-compiled Flax models over a `jax.sharding.Mesh`,
  Pallas kernels for retrieval top-k and fused attention/pooling;
- parallelism: SPMD data parallel + cross-device contrastive negatives via
  XLA collectives (no NCCL-style process groups);
- inference: AOT-compiled bucketed-shape executables instead of ONNX/TRT
  sessions; sharded matmul+top-k instead of Faiss;
- everything-is-a-module assembly: models are built from swappable
  encoders, samplers, scorers and losses, mirroring the reference design
  (see /root/reference README.md:3).
"""

__version__ = "0.1.0"

from nexus_tpu.config import AbsArguments, init_argument  # noqa: F401
