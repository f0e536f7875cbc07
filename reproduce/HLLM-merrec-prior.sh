#!/usr/bin/env bash
# HLLM + event-prior heads on MerRec-2000 (6 event types, oracle priors at test; packed item tower).
# Faithful override set from reference reproduce/HLLM-merrec-prior.slurm (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (8x32); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/merrec_2000-info.parquet}
ITEM_PRETRAIN_DIR=${ITEM_PRETRAIN_DIR:-./from_pretrained/TinyLlama-1.1B-Chat-v1.0}
USER_PRETRAIN_DIR=${USER_PRETRAIN_DIR:-./from_pretrained/TinyLlama_v1.1}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset merrec_2000 \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_PRETRAIN_DIR" \
  --user_pretrain_dir "$USER_PRETRAIN_DIR" \
  --optim_args.learning_rate 1e-4 \
  --accumulate_grad 1 \
  --MAX_TEXT_LENGTH 256 \
  --gradient_checkpointing True \
  --MAX_ITEM_LIST_LENGTH 50 \
  --loss prior \
  --num_negatives 4096 \
  --train_batch_size 256 \
  --text_keys '["category_name","brand_name"]' \
  --suppress_history False \
  --medusa_num_layers 1 \
  --num_segment_head 1 \
  --num_prior_head 6 \
  --head_interaction multiplicative \
  --split_mode combine \
  --use_image_online False \
  --use_image False \
  --pred_len 1 \
  --eval_pred_len 1 \
  --medusa_lambda 0.99 \
  --total_iters 3000 \
  --eval_interval 300 \
  --eval_num_cats 6 \
  --neg_sample_by_cat False \
  --weighted_prior_loss True \
  --log_detailed_results True \
  --min_seq_len 400 \
  --prior_given_at_test True \
  --given_prior_len 1 \
  --outlier_user_metrics event \
  --sample_last_only False \
  --train_test_gap 0 \
  --packed_item_tower True \
  "$@"
