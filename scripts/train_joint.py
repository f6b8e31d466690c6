#!/usr/bin/env python
"""Joint NeRF + segmentation adaptation entry point (one stage).

Same CLI surface as the reference (ref: scripts/train_joint.py:16-44):
  python scripts/train_joint.py --exp cfg/exp/one_step_joint/s00_lr1e-5.yml \
      --exp_name my_exp --nerf_train_epoch 10 --joint_train_epoch 50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu import ROOT_DIR  # noqa: E402
from ucsa_neural_rendering_tpu.config import load_exp_and_env  # noqa: E402
from ucsa_neural_rendering_tpu.train import joint_loop  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="cfg/exp/one_step_joint/s00_lr1e-5.yml")
    parser.add_argument("--exp_name", default="debug",
                        help="name of this continual-learning experiment")
    parser.add_argument("--fix_nerf", action="store_true",
                        help="fix the NeRF during joint training")
    parser.add_argument("--seed", default=123, type=int)
    parser.add_argument("--project_name", default="test_one_by_one")
    parser.add_argument("--nerf_train_epoch", default=10, type=int)
    parser.add_argument("--joint_train_epoch", default=10, type=int)
    return parser.parse_args()


def train(exp, env, exp_cfg_path, env_cfg_path, args):
    """Reference-compatible programmatic entry (used by cl_deeplab)."""
    exp["general"].setdefault("load_pretrain", True)
    return joint_loop.train(exp, env, args, exp_cfg_path, env_cfg_path)


if __name__ == "__main__":
    args = parse_args()
    exp, env, exp_p, env_p = load_exp_and_env(ROOT_DIR, args.exp)
    exp["general"]["load_pretrain"] = True
    train(exp, env, exp_p, env_p, args)
