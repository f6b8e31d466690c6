#!/bin/bash
# Multi-step continual adaptation across scenes 0000-0009
# (ref: run_scripts/multi_step.sh)
python scripts/cl_deeplab.py --exp cfg/exp/multi_step/cl_base.yml \
  --exp_name multi_step --nerf_train_epoch 10 --joint_train_epoch 10 "$@"
