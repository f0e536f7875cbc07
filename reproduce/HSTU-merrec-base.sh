#!/usr/bin/env bash
# HSTU single-head NCE baseline on MerRec-2000 (reference
# reproduce/HSTU-merrec-base.slurm: size4, seq 400, lr 1e-3, 4096 negatives,
# eval_pred_len 1, fixed temperature, event-outlier split).
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
  --eval_batch_size 256 \
  --optim_args.learning_rate 1e-3 \
  --num_negatives 4096 \
  --total_iters 30000 \
  --eval_interval 3000 \
  --loss nce \
  --fix_temp True \
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
  --gradient_checkpointing True
