"""DeepLab conversion validated against the real torchvision structure.

torchvision's released `deeplabv3_resnet101` checkpoint can't be downloaded
here; instead the architecture is reconstructed module-for-module in torch
(torch_deeplab_twin.py) — its state_dict has the released checkpoint's
exact keys/shapes (vendored at tests/data/deeplab_manifest.json) — and the
converter + Flax model are validated against it two ways:

  1. structure: a manifest-shaped state dict converts into a tree that
     matches DeepLabV3.init leaf-for-leaf;
  2. function: random weights loaded into BOTH models produce the same
     logits (eval mode) — catching any silent dilation/padding/BN mismatch
     (ref: nr4seg/network/deeplabv3.py:6-19 + surgery train_joint.py:113-132).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ucsa_neural_rendering_tpu.models import DeepLabV3  # noqa: E402
from ucsa_neural_rendering_tpu.models.torch_converter import (  # noqa: E402
    check_tree_shapes, convert_deeplab_state_dict)

MANIFEST = os.path.join(os.path.dirname(__file__), "data",
                        "deeplab_manifest.json")


def test_manifest_is_current():
    """The vendored manifest must match the twin's state_dict exactly."""
    from torch_deeplab_twin import DeepLabV3TV
    manifest = json.load(open(MANIFEST))
    sd = DeepLabV3TV(40).state_dict()
    assert set(manifest) == set(sd)
    for k, v in sd.items():
        assert manifest[k] == list(v.shape), k


def test_convert_manifest_structure_matches_flax_init():
    """Every released-checkpoint key converts, and the converted tree is
    leaf-identical (names + shapes) to a fresh Flax init."""
    manifest = json.load(open(MANIFEST))
    # Lightning-wrapped keys exactly as the reference checkpoint stores them
    sd = {"_model._model." + k: np.zeros(s, np.float32)
          for k, s in manifest.items()}
    params, batch_stats = convert_deeplab_state_dict(sd)

    variables = DeepLabV3(num_classes=40).init(
        jax.random.key(0), jnp.zeros((1, 48, 64, 3)),
        use_running_average=False)
    errs = check_tree_shapes(params, variables["params"])
    errs += check_tree_shapes(batch_stats, variables["batch_stats"])
    assert not errs, "\n".join(errs)


@pytest.mark.slow
def test_logits_parity_with_torch_twin():
    """End-to-end logits parity: the same random weights through the torch
    twin (= torchvision forward) and the Flax port agree everywhere."""
    from torch_deeplab_twin import DeepLabV3TV

    torch.manual_seed(0)
    num_classes = 8
    model_t = DeepLabV3TV(num_classes).eval()
    # randomize BN stats too (a fresh model has mean 0 / var 1 everywhere,
    # which would mask running-stat wiring bugs)
    sd = model_t.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn_like(v) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand_like(v) * 0.5 + 0.75
    model_t.load_state_dict(sd)

    params, batch_stats = convert_deeplab_state_dict(
        {k: v.numpy() for k, v in sd.items()})

    H, W = 49, 65  # odd sizes exercise padding/upsample corner behaviour
    x = np.random.default_rng(1).uniform(0, 1, (1, H, W, 3)).astype(
        np.float32)
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))["out"].numpy()
    out_j = DeepLabV3(num_classes=num_classes).apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        use_running_average=True, deterministic=True)["out"]
    out_j = np.transpose(np.asarray(out_j), (0, 3, 1, 2))
    np.testing.assert_allclose(out_j, out_t, atol=1e-3, rtol=1e-3)
