#!/usr/bin/env bash
# MMEB-v2 evaluation over a task config (parity: the reference's
# examples/multimodal_retrieval/evaluation/mmeb_v2/run_*.sh scripts).
#
#   MODEL_DIR=/path/to/embedder DATASET_DIR=/path/to/MMEB-v2 \
#     ./run_mmeb.sh configs/smoke.yaml
#
# The dataset dir follows the real MMEB-v2 download layout (HF parquet per
# task + media under image_root/video_root/frame_root).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../../.." && pwd)"
CONFIG="${1:-${REPO_ROOT}/examples/multimodal_retrieval/evaluation/mmeb_v2/configs/smoke.yaml}"
MODEL_DIR="${MODEL_DIR:?set MODEL_DIR to a multimodal embedder save dir}"
DATASET_DIR="${DATASET_DIR:?set DATASET_DIR to the MMEB-v2 data root}"
OUTPUT_DIR="${OUTPUT_DIR:-/tmp/nexus_mmeb_results}"

cd "${REPO_ROOT}"

TASKS=$(python -c "
import yaml, sys
print(' '.join(yaml.safe_load(open('${CONFIG}'))['tasks']))
")

python -m nexus_tpu.evaluation.mmeb_v2 \
  --model_dir "${MODEL_DIR}" \
  --dataset_dir "${DATASET_DIR}" \
  --tasks ${TASKS} \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE:-32}" \
  ${RERANKER_DIR:+--reranker_dir "${RERANKER_DIR}"} \
  ${MEDIA_ROOT:+--media_root "${MEDIA_ROOT}"}
