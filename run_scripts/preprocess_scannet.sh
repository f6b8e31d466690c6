#!/bin/bash
# Offline ScanNet -> NGP-format conversion (ref: run_scripts/preprocess_scannet.sh)
# usage: preprocess_scannet.sh <scene_folder>
set -e
SCENE=$1
python preprocessing_scripts/scannet2transform.py --scene_folder "$SCENE" --scaled_image --semantics
python preprocessing_scripts/scannet2nerf.py --scene_folder "$SCENE" \
  --transform_train "$SCENE/transforms_train_scaled_semantics_40_raw.json" \
  --transform_test "$SCENE/transforms_test_scaled_semantics_40_raw.json"
