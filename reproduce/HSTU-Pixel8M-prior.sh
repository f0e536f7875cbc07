#!/usr/bin/env bash
# HSTU + multi-head human-prior decoding on Pixel8M (reference
# reproduce/HSTU-Pixel8M-prior* run shape: prior loss bound to the 8 coarse
# item categories, per-category negatives, prior-weighted loss).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/Pixel8M-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size4.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset Pixel8M \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 50 \
  --train_batch_size 64 \
  --optim_args.learning_rate 1e-4 \
  --num_negatives 8192 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --eval_pred_len 8 \
  --pred_len 8 \
  --loss prior \
  --eval_num_cats 8 \
  --num_prior_head 8 \
  --medusa_num_layers 1 \
  --neg_sample_by_cat True \
  --weighted_prior_loss True \
  --tag_version v2
