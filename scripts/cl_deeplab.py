#!/usr/bin/env python
"""Multi-step continual-learning protocol over ScanNet scenes 0000-0009.

Same CLI surface as the reference (ref: scripts/cl_deeplab.py:26-51):
  python scripts/cl_deeplab.py --exp cfg/exp/multi_step/cl_base.yml \
      --exp_name my_cl_run --nerf_train_epoch 10 --joint_train_epoch 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu import ROOT_DIR  # noqa: E402
from ucsa_neural_rendering_tpu.config import load_exp_and_env  # noqa: E402
from ucsa_neural_rendering_tpu.train import cl_driver  # noqa: E402

SCENE_ORDER = cl_driver.SCENE_ORDER


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="cfg/exp/multi_step/cl_base.yml")
    parser.add_argument("--exp_name", default="debug")
    parser.add_argument("--seed", default=123, type=int)
    parser.add_argument("--fix_nerf", action="store_true")
    parser.add_argument("--project_name", default="test_one_by_one")
    parser.add_argument("--nerf_train_epoch", default=10, type=int)
    parser.add_argument("--joint_train_epoch", default=10, type=int)
    return parser.parse_args()


def main():
    args = parse_args()
    exp, env, exp_p, env_p = load_exp_and_env(ROOT_DIR, args.exp)
    cl_driver.main(exp, env, args, exp_p, env_p)


if __name__ == "__main__":
    main()
