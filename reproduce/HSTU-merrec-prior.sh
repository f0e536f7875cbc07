#!/usr/bin/env bash
# HSTU + event-prior heads on MerRec-2000 (reference
# reproduce/HSTU-merrec-prior.slurm:25-60: seq 400, lr 1e-3, 4096 negatives,
# 6 event categories, oracle priors at test).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/merrec_2000-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size4.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset merrec_2000 \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 400 \
  --min_seq_len 400 \
  --train_batch_size 64 \
  --optim_args.learning_rate 1e-3 \
  --num_negatives 4096 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --eval_pred_len 8 \
  --pred_len 8 \
  --loss prior \
  --eval_num_cats 6 \
  --num_prior_head 6 \
  --medusa_num_layers 1 \
  --prior_given_at_test True \
  --timestamp_required True
