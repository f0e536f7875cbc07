#!/usr/bin/env bash
# HSTU + multiplicative prior heads on EB-NeRD-512 (7 cluster categories).
# Faithful override set from reference reproduce/HSTU-EBNerd-prior-mult.slurm:48-69 (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (4x128); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/eb_nerd_512-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size2.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset eb_nerd_512 \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 50 \
  --optim_args.learning_rate 1e-4 \
  --loss prior \
  --num_negatives 8192 \
  --accumulate_grad 1 \
  --train_batch_size 512 \
  --gradient_checkpointing True \
  --text_keys '["title","tag","subtitle","topics"]' \
  --suppress_history False \
  --medusa_num_layers 1 \
  --num_segment_head 1 \
  --num_prior_head 7 \
  --head_interaction multiplicative \
  --split_mode combine \
  --use_image False \
  --pred_len 8 \
  --eval_pred_len 8 \
  --medusa_lambda 0.99 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --eval_num_cats 7 \
  --neg_sample_by_cat True \
  --weighted_prior_loss True \
  --log_detailed_results False \
  --tag_version v16 \
  --min_seq_len 100 \
  --prior_given_at_test False \
  --given_prior_len 8 \
  --outlier_user_metrics category \
  --segment_embed True \
  --cluster_as_tag True \
  --eval_by_cat False \
  "$@"
