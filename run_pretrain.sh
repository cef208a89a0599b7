#!/usr/bin/env bash
# K3M pretraining launch (TPU-native equivalent of the reference
# run_pretrain.sh). Scale-out is a jax mesh, not mp.spawn.
set -e
ROOT_DIR=${ROOT_DIR:-./workdir}
DATA_DIR=${DATA_DIR:-$ROOT_DIR/processed}
OUTPUT_DIR=${OUTPUT_DIR:-$ROOT_DIR/output}
MAIN="$(dirname "$0")/pretrain.py"

python "$MAIN" \
  --data_dir "$DATA_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --file_name "{}_feat.k3mr" \
  --model_name "roberta_base" \
  --config_file "k3m_roberta_base.json" \
  --if_pre_sampling 1 \
  --with_coattention \
  --objective 0 \
  --visual_target 0 \
  --use_image \
  --max_seq_length 50 \
  --max_seq_length_pv 256 \
  --max_num_pv 30 \
  --max_region_length 36 \
  --train_batch_size 96 \
  --eval_batch_size 96 \
  --learning_rate 1e-4 \
  --num_train_epochs 5 \
  --log_steps 10 \
  --fp16 \
  "$@"
