#!/usr/bin/env bash
# HLLM two-tower on Pixel8M (reference reproduce/HLLM-Pixel8M-base.slurm:
# TinyLlama-1.1B item + user towers, seq 10, text 256 tok, bs 16/chip).
# Point ITEM_LLM/USER_LLM at local HF checkpoint dirs.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/Pixel8M-info.parquet}
ITEM_LLM=${ITEM_LLM:-./checkpoints/TinyLlama-1.1B}
USER_LLM=${USER_LLM:-./checkpoints/TinyLlama-1.1B}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset Pixel8M \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_LLM" \
  --user_pretrain_dir "$USER_LLM" \
  --MAX_ITEM_LIST_LENGTH 10 \
  --MAX_TEXT_LENGTH 256 \
  --train_batch_size 16 \
  --total_iters 3000 \
  --eval_interval 1000 \
  --gradient_checkpointing True \
  --packed_item_tower True
