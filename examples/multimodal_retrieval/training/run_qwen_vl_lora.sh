#!/usr/bin/env bash
# LoRA fine-tune of a Qwen-VL-family checkpoint as a multimodal embedder
# (parity: the reference's examples/multimodal_retrieval/training/
# run_qwen_vl_lora.sh torchrun entry — same knobs as env vars, the TPU build
# runs ONE process that pjit-shards over the device mesh instead of torchrun).
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
MODEL_NAME_OR_PATH="${MODEL_NAME_OR_PATH:?set MODEL_NAME_OR_PATH to a local HF Qwen2-VL / Qwen2.5-VL / Qwen3-VL checkpoint dir}"
TRAIN_DATA="${TRAIN_DATA:-${REPO_ROOT}/examples/multimodal_retrieval/data/train.jsonl}"
OUTPUT_DIR="${OUTPUT_DIR:-/tmp/nexus_mm_embedder_lora}"

cd "${REPO_ROOT}"

python -m nexus_tpu.training.embedder.multimodal_retrieval \
  --model_name_or_path "${MODEL_NAME_OR_PATH}" \
  --train_data "${TRAIN_DATA}" \
  --output_dir "${OUTPUT_DIR}" \
  --per_device_train_batch_size "${PER_DEVICE_TRAIN_BATCH_SIZE:-4}" \
  --num_train_epochs "${NUM_TRAIN_EPOCHS:-1}" \
  --learning_rate "${LEARNING_RATE:-2e-5}" \
  --train_group_size "${TRAIN_GROUP_SIZE:-4}" \
  --max_length "${MAX_LENGTH:-256}" \
  --image_size "${IMAGE_SIZE:-224}" \
  --temperature "${TEMPERATURE:-0.02}" \
  --sentence_pooling_method "${POOLING_METHOD:-last_token}" \
  --use_chat_template \
  --use_lora \
  --lora_r "${LORA_R:-64}" \
  --lora_alpha "${LORA_ALPHA:-128}" \
  --save_merged_model \
  --logging_steps "${LOGGING_STEPS:-10}" \
  "$@"
