#!/usr/bin/env bash
# HLLM two-tower NCE baseline on MerRec-2000 (reference
# reproduce/HLLM-merrec-base.slurm: TinyLlama towers, seq 50, text 256 tok,
# 4096 negatives, eval_pred_len 1, event-outlier split).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/merrec_2000-info.parquet}
ITEM_LLM=${ITEM_LLM:-./checkpoints/TinyLlama-1.1B-Chat-v1.0}
USER_LLM=${USER_LLM:-./checkpoints/TinyLlama_v1.1}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset merrec_2000 \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_LLM" \
  --user_pretrain_dir "$USER_LLM" \
  --MAX_ITEM_LIST_LENGTH 50 \
  --MAX_TEXT_LENGTH 256 \
  --min_seq_len 400 \
  --train_batch_size 32 \
  --optim_args.learning_rate 1e-4 \
  --num_negatives 4096 \
  --total_iters 3000 \
  --eval_interval 300 \
  --loss nce \
  --text_keys '["category_name","brand_name"]' \
  --medusa_num_layers 0 \
  --num_segment_head 1 \
  --num_prior_head 1 \
  --pred_len 1 \
  --eval_pred_len 1 \
  --eval_num_cats 6 \
  --outlier_user_metrics event \
  --sample_last_only False \
  --train_test_gap 0 \
  --timestamp_required True \
  --log_detailed_results True \
  --gradient_checkpointing True \
  --packed_item_tower True
