#!/usr/bin/env python
"""Segmentation fine-tuning on NeRF renders (one-step finetune).

Same CLI surface as the reference (ref: scripts/train_finetune.py):
  python scripts/train_finetune.py --exp cfg/exp/one_step_finetune_nerf/s00_lr1e-5.yml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu import ROOT_DIR  # noqa: E402
from ucsa_neural_rendering_tpu.config import load_exp_and_env  # noqa: E402
from ucsa_neural_rendering_tpu.train import finetune_loop  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp",
                        default="cfg/exp/one_step_finetune_nerf/s00_lr1e-5.yml")
    parser.add_argument("--seed", default=123, type=int)
    parser.add_argument("--project_name", default="finetune")
    parser.add_argument("--prev_exp_name", default="one_step_nerf_only")
    return parser.parse_args()


def train(exp, env, exp_cfg_path, env_cfg_path, args):
    return finetune_loop.train(exp, env, args, exp_cfg_path, env_cfg_path,
                               prev_exp_name=getattr(args, "prev_exp_name",
                                                     "one_step_nerf_only"))


if __name__ == "__main__":
    args = parse_args()
    exp, env, exp_p, env_p = load_exp_and_env(ROOT_DIR, args.exp)
    train(exp, env, exp_p, env_p, args)
