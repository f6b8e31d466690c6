#!/usr/bin/env python
"""Generate the scannet_frames_25k train/val/test split files
(ref: nr4seg/dataset/create_split.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu import ROOT_DIR  # noqa: E402
from ucsa_neural_rendering_tpu.config import load_exp_and_env, load_yaml  # noqa: E402
from ucsa_neural_rendering_tpu.data import create_split, save_split  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="cfg/exp/pretrain_scannet_25k_deeplabv3.yml")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    exp, env, _, _ = load_exp_and_env(ROOT_DIR, args.config)
    cfg = exp["data_module"]
    split = create_split(cfg["root"],
                         cfg["data_preprocessing"]["image_regex"],
                         cfg["data_preprocessing"]["val_ratio"],
                         seed=args.seed)
    out = os.path.join(env["scannet_frames_25k"],
                       cfg["data_preprocessing"]["split_file"])
    save_split(split, out)
    out_cl = os.path.join(env["scannet_frames_25k"],
                          cfg["data_preprocessing"].get("split_file_cl",
                                                        "split_cl.npz"))
    save_split({"train_cl": split["train_cl"]}, out_cl)
    print(f"wrote {out} ({len(split['train'])} train / {len(split['val'])} "
          f"val) and {out_cl}")


if __name__ == "__main__":
    main()
