#!/usr/bin/env bash
# HLLM + hierarchical prior heads on Pixel8M (8 categories x 2 segments, vision item tower).
# Faithful override set from reference reproduce/HLLM-Pixel8M-prior.slurm (workload flags only; SLURM/
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
  --loss prior \
  --train_batch_size 128 \
  --medusa_num_layers 1 \
  --num_segment_head 2 \
  --num_prior_head 8 \
  --head_interaction hierarchical \
  --split_mode combine \
  --use_image_online False \
  --use_image True \
  --img_height 224 \
  --img_width 224 \
  --pred_len 4 \
  --eval_pred_len 8 \
  --medusa_lambda 0.99 \
  --total_iters 3000 \
  --eval_interval 3000 \
  --eval_num_cats 8 \
  --neg_sample_by_cat True \
  --neg_sample_mix_ratio 0 \
  --pos_sample_mix_ratio 0 \
  --weighted_prior_loss True \
  --log_detailed_results True \
  --tag_version v2 \
  --outlier_user_metrics category \
  --min_seq_len 20 \
  --segment_embed True \
  --save_for_eval False \
  "$@"
