#!/usr/bin/env bash
# HSTU + multi-head human-prior decoding on Pixel8M (8 item categories, 4 segment heads, additive interaction).
# Faithful override set from reference reproduce/HSTU-Pixel8M-prior.slurm:29-70 (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (4x128); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/Pixel8M-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size4.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset Pixel8M \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 50 \
  --optim_args.learning_rate 1e-4 \
  --loss prior \
  --num_negatives 8192 \
  --accumulate_grad 1 \
  --train_batch_size 512 \
  --eval_batch_size 256 \
  --gradient_checkpointing True \
  --medusa_num_layers 1 \
  --num_segment_head 4 \
  --num_prior_head 8 \
  --head_interaction additive \
  --split_mode combine \
  --use_image False \
  --pred_len 8 \
  --eval_pred_len 8 \
  --medusa_lambda 0.99 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --eval_num_cats 8 \
  --neg_sample_by_cat True \
  --weighted_prior_loss True \
  --log_detailed_results True \
  --tag_version v2 \
  --min_seq_len 50 \
  --prior_given_at_test False \
  --given_prior_len 8 \
  --outlier_user_metrics category \
  --segment_embed True \
  "$@"
