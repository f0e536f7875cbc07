#!/usr/bin/env bash
# HSTU multiplicative prior heads on EB-NeRD (reference
# reproduce/HSTU-EBNerd-prior-mult.slurm: size2, 7 user-cluster prior heads
# (tag v16), per-category negatives, weighted prior loss, segment embedding).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/eb_nerd_512-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size2.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset eb_nerd_512 \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 50 \
  --min_seq_len 100 \
  --train_batch_size 128 \
  --optim_args.learning_rate 1e-4 \
  --num_negatives 8192 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --loss prior \
  --medusa_num_layers 1 \
  --num_segment_head 1 \
  --num_prior_head 7 \
  --head_interaction multiplicative \
  --split_mode combine \
  --pred_len 8 \
  --eval_pred_len 8 \
  --eval_num_cats 7 \
  --tag_version v16 \
  --cluster_as_tag True \
  --neg_sample_by_cat True \
  --weighted_prior_loss True \
  --segment_embed True \
  --prior_given_at_test False \
  --given_prior_len 8 \
  --outlier_user_metrics category \
  --gradient_checkpointing True
