#!/usr/bin/env python
"""Convert a reference PyTorch/Lightning DeepLabV3 checkpoint to our orbax
format (strips aux head + Lightning prefixes; ref: scripts/
train_joint.py:113-132 checkpoint surgery).

Usage: python scripts/convert_checkpoint.py <in.ckpt/.pth> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucsa_neural_rendering_tpu.models.torch_converter import (  # noqa: E402
    convert_deeplab_checkpoint)
from ucsa_neural_rendering_tpu.train.checkpoints import save_deeplab  # noqa: E402


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    in_path, out_dir = sys.argv[1], sys.argv[2]
    params, batch_stats = convert_deeplab_checkpoint(in_path)
    save_deeplab(out_dir, params, batch_stats)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {in_path} -> {out_dir} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
