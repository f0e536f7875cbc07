#!/usr/bin/env bash
# HLLM hierarchical prior heads on EB-NeRD (reference
# reproduce/HLLM-EBNerd-prior.slurm: 2 segment × 11 user-cluster prior heads
# (tag v11), hierarchical head interaction, per-category negatives,
# weighted prior loss, segment embedding).
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
  --loss prior \
  --text_keys '["title","subtitle","topics"]' \
  --medusa_num_layers 1 \
  --num_segment_head 2 \
  --num_prior_head 11 \
  --head_interaction hierarchical \
  --split_mode combine \
  --pred_len 4 \
  --eval_pred_len 8 \
  --eval_num_cats 11 \
  --tag_version v11 \
  --cluster_as_tag True \
  --neg_sample_by_cat True \
  --weighted_prior_loss True \
  --segment_embed True \
  --outlier_user_metrics category \
  --log_detailed_results True \
  --gradient_checkpointing True \
  --packed_item_tower True
