#!/usr/bin/env bash
# HLLM two-tower NCE baseline on EB-NeRD (reference
# reproduce/HLLM-EBNerd-base.slurm: TinyLlama-1.1B-Chat item tower +
# TinyLlama_v1.1 user tower, seq 24, text 256 tok, 4096 negatives,
# 2 segment heads, pred_len 4 / eval 8).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/eb_nerd_512-info.parquet}
ITEM_LLM=${ITEM_LLM:-./checkpoints/TinyLlama-1.1B-Chat-v1.0}
USER_LLM=${USER_LLM:-./checkpoints/TinyLlama_v1.1}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset eb_nerd_512 \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_LLM" \
  --user_pretrain_dir "$USER_LLM" \
  --MAX_ITEM_LIST_LENGTH 24 \
  --MAX_TEXT_LENGTH 256 \
  --min_seq_len 40 \
  --train_batch_size 32 \
  --optim_args.learning_rate 1e-4 \
  --num_negatives 4096 \
  --total_iters 3000 \
  --eval_interval 300 \
  --loss nce \
  --text_keys '["title","subtitle","topics"]' \
  --medusa_num_layers 1 \
  --num_segment_head 2 \
  --num_prior_head 1 \
  --head_interaction multiplicative \
  --split_mode combine \
  --pred_len 4 \
  --eval_pred_len 8 \
  --eval_num_cats 6 \
  --tag_version v2 \
  --outlier_user_metrics category \
  --log_detailed_results True \
  --gradient_checkpointing True \
  --packed_item_tower True
