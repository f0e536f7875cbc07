#!/usr/bin/env bash
# HSTU single-head NCE baseline on EB-NeRD (reference
# reproduce/HSTU-EBNerd-base.slurm: size3, seq 50, bs 128, 8192 negatives,
# cluster-as-tag priors v3 used for eval splits only, pred_len 1 / eval 8).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/eb_nerd_512-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size3.yaml overall/ID.yaml IDNet/hstu.yaml -- \
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
  --loss nce \
  --medusa_num_layers 0 \
  --num_segment_head 1 \
  --num_prior_head 1 \
  --pred_len 1 \
  --eval_pred_len 8 \
  --eval_num_cats 8 \
  --tag_version v3 \
  --cluster_as_tag True \
  --outlier_user_metrics category \
  --log_detailed_results True \
  --gradient_checkpointing True
