#!/usr/bin/env bash
# Item-alignment finetune (TPU-native equivalent of
# run_finetune_item_alignment.sh).
set -e
ROOT_DIR=${ROOT_DIR:-./workdir}
DATA_DIR=${DATA_DIR:-$ROOT_DIR/processed}
OUTPUT_DIR=${OUTPUT_DIR:-$ROOT_DIR/output_ft}
MAIN="$(dirname "$0")/finetune.py"

python "$MAIN" \
  --data_dir "$DATA_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --file_train "train_item_alignment.k3mr" \
  --file_valid "valid_item_alignment.k3mr" \
  --use_image \
  --with_coattention \
  --do_train --do_eval \
  --loss_type inner \
  --if_pre_sampling 1 \
  --train_batch_size 32 \
  --learning_rate 5e-5 \
  --warmup_proportion 0.3 \
  --num_train_epochs 10 \
  --max_seq_length 50 \
  --max_seq_length_pv 256 \
  --max_num_pv 30 \
  --max_region_length 36 \
  "$@"
