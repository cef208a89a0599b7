#!/usr/bin/env bash
# Data preparation (TPU-native equivalent of run_data_prepare.sh):
# item_info.jsonl + images -> {split}_feat.k3mr via the JAX Faster R-CNN.
set -e
ROOT_DIR=${ROOT_DIR:-./workdir}
DATA_DIR=${DATA_DIR:-$ROOT_DIR/raw}
OUTPUT_DIR=${OUTPUT_DIR:-$ROOT_DIR/processed}
CV_MODEL_FILE=${CV_MODEL_FILE:-$ROOT_DIR/cv_model/faster_rcnn_from_caffe.pkl}
mkdir -p "$OUTPUT_DIR"
for SPLIT in train valid; do
  python -m k3m_tpu.data.prepare \
    --item_info "$DATA_DIR/item_info_${SPLIT}.jsonl" \
    --image_dir "$DATA_DIR/item_images" \
    --extract_features \
    --jieba \
    --output "$OUTPUT_DIR/${SPLIT}_feat.k3mr" \
    "$@"
done
