#!/usr/bin/env bash
# HLLM baseline on EB-NeRD-512 (TinyLlama towers, text only; packed varlen item tower).
# Faithful override set from reference reproduce/HLLM-EBNerd-base.slurm (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (2x8x32); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/eb_nerd_512-info.parquet}
ITEM_PRETRAIN_DIR=${ITEM_PRETRAIN_DIR:-./from_pretrained/TinyLlama-1.1B-Chat-v1.0}
USER_PRETRAIN_DIR=${USER_PRETRAIN_DIR:-./from_pretrained/TinyLlama_v1.1}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset eb_nerd_512 \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_PRETRAIN_DIR" \
  --user_pretrain_dir "$USER_PRETRAIN_DIR" \
  --optim_args.learning_rate 1e-4 \
  --accumulate_grad 1 \
  --MAX_TEXT_LENGTH 256 \
  --gradient_checkpointing True \
  --MAX_ITEM_LIST_LENGTH 24 \
  --loss nce \
  --num_negatives 4096 \
  --train_batch_size 512 \
  --text_keys '["title","subtitle","topics"]' \
  --suppress_history False \
  --medusa_num_layers 1 \
  --num_segment_head 2 \
  --num_prior_head 1 \
  --head_interaction multiplicative \
  --split_mode combine \
  --use_image_online False \
  --use_image False \
  --pred_len 4 \
  --eval_pred_len 8 \
  --medusa_lambda 0.99 \
  --total_iters 3000 \
  --eval_interval 300 \
  --eval_num_cats 6 \
  --neg_sample_by_cat False \
  --log_detailed_results True \
  --tag_version v2 \
  --min_seq_len 40 \
  --outlier_user_metrics category \
  --packed_item_tower True \
  "$@"
