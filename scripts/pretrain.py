#!/usr/bin/env python
"""DeepLabV3 pretraining entry point.

Same CLI surface as the reference (ref: scripts/pretrain.py:117-133):
  python scripts/pretrain.py --exp cfg/exp/pretrain_scannet_25k_deeplabv3.yml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu import ROOT_DIR  # noqa: E402
from ucsa_neural_rendering_tpu.config import load_exp_and_env  # noqa: E402
from ucsa_neural_rendering_tpu.train import pretrain_loop  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp",
                        default="cfg/exp/pretrain_scannet_25k_deeplabv3.yml",
                        help="Experiment yaml path relative to the repo root.")
    parser.add_argument("--seed", default=123, type=int)
    parser.add_argument("--project_name", default="pretrain")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    exp, env, exp_p, env_p = load_exp_and_env(ROOT_DIR, args.exp)
    pretrain_loop.train(exp, env, args, exp_p, env_p)
