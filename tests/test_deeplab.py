"""DeepLabV3 Flax model + torch-checkpoint converter tests.

torchvision is not installed here, so the converter is tested against a
synthesized state dict with the exact torchvision deeplabv3_resnet101 key
set and shapes, and conv/BN/resize semantics are cross-checked against raw
torch (available CPU-only) for numerical parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.models import DeepLabV3
from ucsa_neural_rendering_tpu.models.torch_converter import (
    check_tree_shapes, convert_deeplab_state_dict, strip_lightning_prefix)

BLOCKS = {"layer1": (3, 64, 256), "layer2": (4, 128, 512),
          "layer3": (23, 256, 1024), "layer4": (3, 512, 2048)}


def fake_torchvision_state_dict(rng, num_classes=40, with_aux=True,
                                lightning_prefix=None):
    """Exact key set + shapes of torchvision deeplabv3_resnet101."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(
            np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.array(100)

    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    inplanes = 64
    for lname, (n, planes, cout) in BLOCKS.items():
        for b in range(n):
            base = f"backbone.{lname}.{b}"
            cin = inplanes if b == 0 else cout
            conv(base + ".conv1", planes, cin, 1)
            bn(base + ".bn1", planes)
            conv(base + ".conv2", planes, planes, 3)
            bn(base + ".bn2", planes)
            conv(base + ".conv3", cout, planes, 1)
            bn(base + ".bn3", cout)
            if b == 0:
                conv(base + ".downsample.0", cout, cin, 1)
                bn(base + ".downsample.1", cout)
        inplanes = cout

    # ASPP: branches 0 (1x1) + 1-3 (3x3 atrous) + 4 (pool)
    conv("classifier.0.convs.0.0", 256, 2048, 1)
    bn("classifier.0.convs.0.1", 256)
    for i in (1, 2, 3):
        conv(f"classifier.0.convs.{i}.0", 256, 2048, 3)
        bn(f"classifier.0.convs.{i}.1", 256)
    conv("classifier.0.convs.4.1", 256, 2048, 1)
    bn("classifier.0.convs.4.2", 256)
    conv("classifier.0.project.0", 256, 1280, 1)
    bn("classifier.0.project.1", 256)
    conv("classifier.1", 256, 256, 3)
    bn("classifier.2", 256)
    conv("classifier.4", num_classes, 256, 1)
    sd["classifier.4.bias"] = rng.normal(size=num_classes).astype(np.float32)

    if with_aux:
        conv("aux_classifier.0", 256, 1024, 3)
        bn("aux_classifier.1", 256)
        conv("aux_classifier.4", num_classes, 256, 1)
        sd["aux_classifier.4.bias"] = rng.normal(size=num_classes).astype(
            np.float32)
    if lightning_prefix:
        sd = {lightning_prefix + k: v for k, v in sd.items()}
    return sd


@pytest.fixture(scope="module")
def deeplab_init():
    model = DeepLabV3(num_classes=40)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 33, 41, 3)),
                           use_running_average=False)
    return model, variables


@pytest.mark.slow
def test_converter_covers_full_tree(deeplab_init):
    model, variables = deeplab_init
    rng = np.random.default_rng(0)
    sd = fake_torchvision_state_dict(rng, with_aux=True,
                                     lightning_prefix="_model._model.")
    params, batch_stats = convert_deeplab_state_dict(sd)
    errs = check_tree_shapes(params, variables["params"])
    errs += check_tree_shapes(batch_stats, variables["batch_stats"])
    assert errs == [], "\n".join(errs[:20])


@pytest.mark.slow
def test_deeplab_forward_shapes(deeplab_init):
    model, variables = deeplab_init
    out = model.apply(variables, jnp.zeros((1, 33, 41, 3)))
    assert out["out"].shape == (1, 33, 41, 40)
    assert np.isfinite(np.asarray(out["out"])).all()


def test_strip_lightning_prefix():
    sd = {"_model._model.backbone.conv1.weight": 1,
          "_model._model.aux_classifier.0.weight": 2}
    out = strip_lightning_prefix(sd)
    assert out == {"backbone.conv1.weight": 1}


def test_conv_semantics_match_torch(rng):
    """flax NHWC conv with converted OIHW weights == torch conv2d, including
    stride, asymmetric input, padding and dilation."""
    import torch
    import torch.nn.functional as F
    from flax import linen as nn

    x = rng.normal(size=(1, 13, 17, 5)).astype(np.float32)
    w = rng.normal(size=(7, 5, 3, 3)).astype(np.float32)  # OIHW
    with jax.default_matmul_precision("float32"):
        for stride, dil in [(1, 1), (2, 1), (1, 2), (1, 4)]:
            pad = dil
            ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(w), stride=stride, padding=pad,
                           dilation=dil).numpy().transpose(0, 2, 3, 1)
            conv = nn.Conv(7, (3, 3), strides=(stride, stride),
                           kernel_dilation=(dil, dil),
                           padding=[(pad, pad)] * 2, use_bias=False)
            out = conv.apply({"params": {"kernel": jnp.asarray(
                w.transpose(2, 3, 1, 0))}}, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                       atol=1e-4)


def test_batchnorm_eval_matches_torch(rng):
    import torch
    from flax import linen as nn

    c = 6
    x = rng.normal(size=(2, 5, 5, c)).astype(np.float32)
    weight = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 1.5, c).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.from_numpy(weight)
    tbn.bias.data = torch.from_numpy(bias)
    tbn.running_mean.data = torch.from_numpy(mean)
    tbn.running_var.data = torch.from_numpy(var)
    tbn.eval()
    ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))
              ).detach().numpy().transpose(0, 2, 3, 1)

    fbn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=True)
    out = fbn.apply({"params": {"scale": jnp.asarray(weight),
                                "bias": jnp.asarray(bias)},
                     "batch_stats": {"mean": jnp.asarray(mean),
                                     "var": jnp.asarray(var)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_update_matches_torch(rng):
    """Train-mode BN parity: torch normalizes with the BIASED batch variance
    but stores the UNBIASED (Bessel-corrected) one into running_var; flax's
    nn.BatchNorm stores the biased one (round-3 review finding). Our
    TorchBatchNorm must match torch on both the output and the updated
    running stats."""
    import torch

    from ucsa_neural_rendering_tpu.models.resnet import TorchBatchNorm

    c = 6
    x = rng.normal(size=(4, 5, 5, c)).astype(np.float32)
    weight = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 1.5, c).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.from_numpy(weight)
    tbn.bias.data = torch.from_numpy(bias)
    tbn.running_mean.data = torch.from_numpy(mean.copy())
    tbn.running_var.data = torch.from_numpy(var.copy())
    tbn.train()
    ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))
              ).detach().numpy().transpose(0, 2, 3, 1)

    fbn = TorchBatchNorm(use_running_average=False)
    out, mutated = fbn.apply(
        {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
         "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
        jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    """jax.image.resize 'bilinear' == torch interpolate align_corners=False."""
    import torch
    import torch.nn.functional as F

    from ucsa_neural_rendering_tpu.models.deeplabv3 import resize_bilinear

    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=(19, 23), mode="bilinear",
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    out = resize_bilinear(jnp.asarray(x), (19, 23))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_bf16_compute_close_to_f32(rng):
    """bf16 compute dtype (opt-in accel for large per-chip batches):
    identical param tree,
    logits within bf16 rounding of the f32 model, labels overwhelmingly
    equal. Params / BN stats / upsampled logits stay f32."""
    from ucsa_neural_rendering_tpu.models import TINY_LAYOUT, seg_compute_dtype

    kw = dict(num_classes=9, backbone_layout=TINY_LAYOUT, aspp_channels=12,
              head_channels=12)
    m32 = DeepLabV3(dtype=jnp.float32, **kw)
    m16 = DeepLabV3(dtype=jnp.bfloat16, **kw)
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32))
    variables = m32.init(jax.random.key(0), x, use_running_average=False)
    # same tree works in both models (param_dtype is f32 in both)
    o32 = m32.apply(variables, x)["out"]
    o16 = m16.apply(variables, x)["out"]
    assert o16.dtype == jnp.float32  # resize upcasts before the loss
    scale = float(jnp.max(jnp.abs(o32)))
    assert float(jnp.max(jnp.abs(o16 - o32))) < 0.05 * max(scale, 1.0)
    agree = float(jnp.mean(jnp.argmax(o16, -1) == jnp.argmax(o32, -1)))
    assert agree > 0.98

    # train step under bf16 compute: runs, loss finite, grads land in f32
    from ucsa_neural_rendering_tpu.train.seg_trainer import SegTrainer
    tr = SegTrainer(m16, {"name": "Adam", "lr": 1e-3})
    state = tr.init(jax.random.key(1), image_hw=(48, 64))
    labels = jnp.asarray(rng.integers(-1, 9, (2, 48, 64)).astype(np.int32))
    state2, loss, conf = tr.train_step(state, x, labels, 1e-3)
    assert np.isfinite(float(loss))
    leaf = jax.tree_util.tree_leaves(state2[0])[0]
    assert leaf.dtype == jnp.float32


def test_seg_compute_dtype_config():
    from ucsa_neural_rendering_tpu.models import seg_compute_dtype
    # explicit override always wins
    assert seg_compute_dtype({"compute_dtype": "float32"}) == jnp.float32
    assert seg_compute_dtype({"compute_dtype": "bfloat16"}) == jnp.bfloat16
    # default: f32 everywhere (measured neutral-to-worse at the
    # reference's batch size on TPU; see PERFORMANCE.md round 3)
    assert seg_compute_dtype({}) == jnp.float32
    assert seg_compute_dtype(None) == jnp.float32
