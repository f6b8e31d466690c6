#!/bin/bash
# Fine-tune segmentation on NeRF renders (ref: run_scripts/one_step_finetune_train.sh)
for scene in s00 s10 s20 s30 s40 s50 s60 s70 s80 s90; do
  python scripts/train_finetune.py --exp cfg/exp/one_step_finetune_nerf/${scene}_lr1e-5.yml "$@"
done
