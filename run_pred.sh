#!/usr/bin/env bash
# Batch embedding inference (TPU-native equivalent of run_pred.sh):
# writes deepAI_result_threshold=*.jsonl with per-item embeddings.
set -e
ROOT_DIR=${ROOT_DIR:-./workdir}
DATA_DIR=${DATA_DIR:-$ROOT_DIR/processed}
OUTPUT_DIR=${OUTPUT_DIR:-$ROOT_DIR/output_ft}
MAIN="$(dirname "$0")/finetune.py"
THRESHOLD=${THRESHOLD:-0.5}

python "$MAIN" \
  --data_dir "$DATA_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --file_test "test_item_alignment.k3mr" \
  --use_image \
  --with_coattention \
  --do_pred \
  --threshold "$THRESHOLD" \
  --eval_batch_size 1024 \
  --max_seq_length 50 \
  --max_seq_length_pv 256 \
  --max_num_pv 30 \
  --max_region_length 36 \
  "$@"
