#!/usr/bin/env bash
# HSTU base (no priors) on Pixel8M — single-host TPU run.
# Mirrors reference reproduce/HSTU-Pixel8M-base.slurm:8-64 run shape:
# size4 (1024d/16L/16h), seq 50, bs 64/chip, lr 1e-4, 8192 negatives,
# 30k iters, eval every 3k, eval_pred_len 8, 8 categories (tag v2).
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
  --eval_num_cats 8 \
  --tag_version v2 \
  --loss nce
