#!/usr/bin/env bash
# HLLM hierarchical prior heads on Pixel8M with an image item tower
# (reference reproduce/HLLM-Pixel8M-prior.slurm: Qwen2-VL-2B item tower +
# Qwen2.5-1.5B user tower, use_image, 2 segment × 8 category prior heads,
# hierarchical interaction, val_only evaluation of a trained checkpoint).
set -euo pipefail
DATA_PATH=${DATA_PATH:-./dataset}
TEXT_PATH=${TEXT_PATH:-./information/Pixel8M-info.parquet}
ITEM_LLM=${ITEM_LLM:-./checkpoints/Qwen2-VL-2B-Instruct}
USER_LLM=${USER_LLM:-./checkpoints/Qwen2.5-1.5B}
RESUME=${RESUME:-}   # orbax checkpoint dir of the trained run

python -m mhrec_tpu.run \
  --config_file overall/LLM.yaml HLLM/HLLM.yaml -- \
  --data_path "$DATA_PATH" \
  --dataset Pixel8M \
  --text_path "$TEXT_PATH" \
  --item_pretrain_dir "$ITEM_LLM" \
  --user_pretrain_dir "$USER_LLM" \
  ${RESUME:+--load_checkpoint_name "$RESUME"} \
  --MAX_ITEM_LIST_LENGTH 10 \
  --MAX_TEXT_LENGTH 256 \
  --min_seq_len 20 \
  --train_batch_size 16 \
  --optim_args.learning_rate 1e-4 \
  --total_iters 3000 \
  --eval_interval 3000 \
  --loss prior \
  --medusa_num_layers 1 \
  --num_segment_head 2 \
  --num_prior_head 8 \
  --head_interaction hierarchical \
  --split_mode combine \
  --use_image True \
  --img_height 224 \
  --img_width 224 \
  --pred_len 4 \
  --eval_pred_len 8 \
  --eval_num_cats 8 \
  --tag_version v2 \
  --neg_sample_by_cat True \
  --neg_sample_mix_ratio 0 \
  --pos_sample_mix_ratio 0 \
  --weighted_prior_loss True \
  --segment_embed True \
  --outlier_user_metrics category \
  --log_detailed_results True \
  --gradient_checkpointing True \
  --val_only True
