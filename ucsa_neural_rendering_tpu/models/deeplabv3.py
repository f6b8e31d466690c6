"""DeepLabV3 (ResNet-101, output stride 8) segmentation model in Flax.

Equivalent of the reference's torchvision wrapper
(ref: nr4seg/network/deeplabv3.py:6-19 →
torchvision.models.segmentation.deeplabv3_resnet101 with num_classes=40 and
the aux head dropped — the reference strips `aux_classifier` keys on load,
ref: scripts/train_joint.py:113-132). NHWC layout, bilinear upsample with
half-pixel centers (torch `align_corners=False`).

Module names mirror the torch state_dict (aspp_conv0..4, aspp_project,
head_conv/head_bn, classifier) for the weight converter.
"""

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import BN, RESNET101_LAYOUT, TINY_LAYOUT, ResNet101Backbone


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling, rates (12, 24, 36) at output stride 8."""
    out_channels: int = 256
    atrous_rates: tuple = (12, 24, 36)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True,
                 deterministic: bool = True):
        bn = partial(BN, use_running_average=use_running_average,
                     dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        branches = []
        # 1x1 branch
        h = conv(self.out_channels, (1, 1), name="aspp_conv0")(x)
        branches.append(nn.relu(bn(name="aspp_bn0")(h)))
        # atrous branches
        for bi, rate in enumerate(self.atrous_rates, start=1):
            h = conv(self.out_channels, (3, 3), kernel_dilation=(rate, rate),
                     padding=[(rate, rate)] * 2, name=f"aspp_conv{bi}")(x)
            branches.append(nn.relu(bn(name=f"aspp_bn{bi}")(h)))
        # image-pooling branch: global mean → 1x1 conv → broadcast back
        # (mean accumulates in f32 even under bf16 compute: ~1.2k-element
        # reductions lose mass in bf16)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                          keepdims=True).astype(x.dtype)
        h = conv(self.out_channels, (1, 1), name="aspp_conv4")(pooled)
        h = nn.relu(bn(name="aspp_bn4")(h))
        h = jnp.broadcast_to(h, x.shape[:3] + (self.out_channels,))
        branches.append(h)

        h = jnp.concatenate(branches, axis=-1)
        h = conv(self.out_channels, (1, 1), name="aspp_project")(h)
        h = nn.relu(bn(name="aspp_project_bn")(h))
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return h


def seg_compute_dtype(model_cfg: dict = None):
    """Compute dtype for the seg model from `exp["model"]["compute_dtype"]`.

    Default f32 — matching the torch reference, which trains the seg net in
    f32 (ref scripts/pretrain.py, no AMP) — and it is FREE on TPU: XLA
    already lowers f32 convs to bf16 MXU passes with f32 accumulation, so
    at the reference's own batch size (4, cfg/exp/pretrain_*.yml) model-
    level bf16 measures 1.01x train / 0.90x eval (scripts/bench_seg.py,
    PERFORMANCE.md round 3). `compute_dtype: bfloat16` is the measured
    opt-in for larger per-chip batches (1.24x train at batch 16), where
    halved activation traffic starts to pay; params, BN statistics (flax
    computes batch stats in f32 regardless of `dtype`), the bilinear
    upsample, and the CE loss stay f32, and labels agree with f32 to 99.9%
    (tests/test_deeplab.py).
    """
    name = (model_cfg or {}).get("compute_dtype", None)
    return jnp.dtype(name) if name is not None else jnp.float32


def resize_bilinear(x, out_hw):
    """Bilinear resize with half-pixel centers (torch align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]),
                            method="bilinear")


class DeepLabV3(nn.Module):
    num_classes: int = 40
    dtype: jnp.dtype = jnp.float32
    # backbone_layout=TINY_LAYOUT + small widths give a structurally
    # identical model at ~1/30 the op count for tests / the multi-chip
    # dryrun (full R101 compiles cost minutes on 8 virtual CPU devices)
    backbone_layout: tuple = RESNET101_LAYOUT
    aspp_channels: int = 256
    head_channels: int = 256

    @nn.compact
    def __call__(self, x, use_running_average: bool = True,
                 deterministic: bool = True):
        """x: [B, H, W, 3] in [0, 1] (the reference feeds unnormalized 0-1
        images). Returns {"out": logits [B, H, W, num_classes]}."""
        in_hw = x.shape[1:3]
        feats = ResNet101Backbone(dtype=self.dtype,
                                  layout=self.backbone_layout,
                                  name="backbone")(x, use_running_average)
        h = ASPP(out_channels=self.aspp_channels, dtype=self.dtype,
                 name="aspp")(feats, use_running_average, deterministic)
        h = nn.Conv(self.head_channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False,
                    dtype=self.dtype, name="head_conv")(h)
        h = BN(use_running_average=use_running_average, dtype=self.dtype,
               name="head_bn")(h)
        h = nn.relu(h)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype, name="classifier")(h)
        logits = resize_bilinear(logits.astype(jnp.float32), in_hw)
        return {"out": logits}
