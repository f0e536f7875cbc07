#!/usr/bin/env bash
# HSTU + event-prior heads on MerRec-2000 (6 event types, oracle priors at test).
# Faithful override set from reference reproduce/HSTU-merrec-prior.slurm:25-60 (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (8x64); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/merrec_2000-info.parquet}

python -m mhrec_tpu.run \
  --config_file IDNet/hstu-size4.yaml overall/ID.yaml IDNet/hstu.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset merrec_2000 \
  --text_path "$TEXT_PATH" \
  --MAX_ITEM_LIST_LENGTH 400 \
  --optim_args.learning_rate 1e-3 \
  --loss prior \
  --num_negatives 4096 \
  --accumulate_grad 1 \
  --train_batch_size 512 \
  --eval_batch_size 256 \
  --gradient_checkpointing True \
  --text_keys '["category_name","brand_name"]' \
  --suppress_history False \
  --fix_temp True \
  --medusa_num_layers 1 \
  --num_segment_head 1 \
  --num_prior_head 6 \
  --head_interaction multiplicative \
  --split_mode combine \
  --pred_len 1 \
  --eval_pred_len 1 \
  --medusa_lambda 0.99 \
  --total_iters 30000 \
  --eval_interval 3000 \
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
  "$@"
