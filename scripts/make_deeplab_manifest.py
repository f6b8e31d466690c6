#!/usr/bin/env python
"""Generate the torchvision `deeplabv3_resnet101` state-dict manifest.

torchvision is not installable in this environment; the architecture twin
lives at tests/torch_deeplab_twin.py (module-for-module reconstruction —
see its docstring). This dumps its state_dict key → shape map to
tests/data/deeplab_manifest.json: the vendored ground truth the weight
converter is validated against (ref: nr4seg/network/deeplabv3.py:6-19
wraps exactly this torchvision model).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))

from torch_deeplab_twin import DeepLabV3TV  # noqa: E402


def main():
    num_classes = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    model = DeepLabV3TV(num_classes)
    manifest = {k: list(v.shape) for k, v in model.state_dict().items()}
    out = os.path.join(ROOT, "tests", "data", "deeplab_manifest.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    n_vals = sum(1 for _ in manifest)
    n_params = sum(int(__import__("numpy").prod(s)) if s else 1
                   for s in manifest.values())
    print(f"{n_vals} keys, {n_params / 1e6:.1f}M values -> {out}")


if __name__ == "__main__":
    main()
