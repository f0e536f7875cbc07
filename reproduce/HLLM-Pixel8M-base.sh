#!/usr/bin/env bash
# HLLM baseline on Pixel8M (Qwen2-VL-2B vision item tower + Qwen2.5-1.5B user tower).
# Faithful override set from reference reproduce/HLLM-Pixel8M-base.slurm:29-72 (workload flags only; SLURM/
# infra flags dropped). train_batch_size here is the GLOBAL batch =
# reference per-GPU batch x its world size (8x16); the data mesh shards it
# across however many chips are present.
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/Pixel8M-info.parquet}
ITEM_PRETRAIN_DIR=${ITEM_PRETRAIN_DIR:-./from_pretrained/Qwen2-VL-2B-Instruct}
USER_PRETRAIN_DIR=${USER_PRETRAIN_DIR:-./from_pretrained/Qwen2.5-1.5B}

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset Pixel8M \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_PRETRAIN_DIR" \
  --user_pretrain_dir "$USER_PRETRAIN_DIR" \
  --optim_args.learning_rate 1e-4 \
  --accumulate_grad 1 \
  --MAX_TEXT_LENGTH 256 \
  --gradient_checkpointing True \
  --MAX_ITEM_LIST_LENGTH 10 \
  --loss nce \
  --train_batch_size 128 \
  --medusa_num_layers 0 \
  --num_segment_head 1 \
  --num_prior_head 1 \
  --head_interaction multiplicative \
  --split_mode combine \
  --use_image_online False \
  --use_image True \
  --img_height 224 \
  --img_width 224 \
  --pred_len 1 \
  --eval_pred_len 8 \
  --medusa_lambda 0.99 \
  --total_iters 3000 \
  --eval_interval 600 \
  --eval_num_cats 8 \
  --neg_sample_by_cat False \
  --neg_sample_mix_ratio 0 \
  --pos_sample_mix_ratio 0 \
  --log_detailed_results True \
  --tag_version v2 \
  --outlier_user_metrics category \
  --min_seq_len 20 \
  --save_for_eval False \
  "$@"
