"""Torch(vision) DeepLabV3 checkpoint → Flax params/batch_stats converter.

Replaces the reference's checkpoint-surgery load path
(ref: scripts/train_joint.py:113-132, scripts/train_finetune.py:93-103):
strip `aux_classifier` keys, drop the Lightning `_model._model.` /
`seg_model._model.` prefixes, then map the torchvision
`deeplabv3_resnet101` state_dict onto our Flax module tree
(OIHW conv weights → HWIO kernels; BN weight/bias/running_mean/running_var →
scale/bias/mean/var). Works from a torch .ckpt/.pth file (torch is CPU-only
here and used solely for deserialization) or from a pre-extracted
{key: ndarray} dict.
"""

import re

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in ckpt.items()
            if hasattr(v, "detach")}


def strip_lightning_prefix(sd: dict) -> dict:
    """Drop aux head + Lightning wrapper prefixes
    (ref: train_joint.py:115-127)."""
    out = {}
    for k, v in sd.items():
        if "aux_classifier" in k:
            continue
        for prefix in ("_model._model.", "seg_model._model.", "_model.",
                       "seg_model.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _assign(tree, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


_ASPP_BRANCH = re.compile(r"classifier\.0\.convs\.(\d)\.(\d)\.(.+)")
_BACKBONE_BLOCK = re.compile(r"backbone\.(layer\d)\.(\d+)\.(.+)")

_BN_MAP = {"weight": ("params", "scale"), "bias": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}


def convert_deeplab_state_dict(sd: dict):
    """torchvision deeplabv3_resnet101 state_dict → (params, batch_stats)
    pytrees matching ucsa_neural_rendering_tpu.models.DeepLabV3."""
    sd = strip_lightning_prefix(sd)
    params, batch_stats = {}, {}

    def put_conv(flax_path, w):
        _assign(params, flax_path + ("kernel",), _conv(w))

    def put_bn(flax_path, torch_leaf, v):
        if torch_leaf == "num_batches_tracked":
            return
        coll, name = _BN_MAP[torch_leaf]
        tree = params if coll == "params" else batch_stats
        _assign(tree, flax_path + (name,), np.asarray(v))

    for k, v in sd.items():
        m = _BACKBONE_BLOCK.match(k)
        if m:
            layer, block, rest = m.group(1), m.group(2), m.group(3)
            base = ("backbone", f"{layer}_{block}")
            if rest.startswith("conv"):
                put_conv(base + (rest.split(".")[0],), v)
            elif rest.startswith("bn"):
                bn_name, leaf = rest.split(".")
                put_bn(base + (bn_name,), leaf, v)
            elif rest.startswith("downsample.0"):
                put_conv(base + ("downsample_conv",), v)
            elif rest.startswith("downsample.1"):
                put_bn(base + ("downsample_bn",), rest.split(".")[-1], v)
            else:
                raise KeyError(f"unhandled backbone key {k}")
            continue
        if k == "backbone.conv1.weight":
            put_conv(("backbone", "conv1"), v)
            continue
        if k.startswith("backbone.bn1."):
            put_bn(("backbone", "bn1"), k.split(".")[-1], v)
            continue
        m = _ASPP_BRANCH.match(k)
        if m:
            branch, sub, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
            # branches 0-3: Sequential(conv, bn, relu) → sub 0=conv, 1=bn
            # branch 4 (pooling): Sequential(pool, conv, bn, relu) → 1=conv, 2=bn
            conv_sub = 1 if branch == 4 else 0
            if sub == conv_sub:
                put_conv(("aspp", f"aspp_conv{branch}"), v)
            else:
                put_bn(("aspp", f"aspp_bn{branch}"), leaf, v)
            continue
        if k.startswith("classifier.0.project.0."):
            put_conv(("aspp", "aspp_project"), v)
            continue
        if k.startswith("classifier.0.project.1."):
            put_bn(("aspp", "aspp_project_bn"), k.split(".")[-1], v)
            continue
        if k == "classifier.1.weight":
            put_conv(("head_conv",), v)
            continue
        if k.startswith("classifier.2."):
            put_bn(("head_bn",), k.split(".")[-1], v)
            continue
        if k == "classifier.4.weight":
            put_conv(("classifier",), v)
            continue
        if k == "classifier.4.bias":
            _assign(params, ("classifier", "bias"), np.asarray(v))
            continue
        raise KeyError(f"unhandled checkpoint key {k}")

    return params, batch_stats


def convert_deeplab_checkpoint(path: str):
    """File path → (params, batch_stats)."""
    return convert_deeplab_state_dict(load_torch_state_dict(path))


def check_tree_shapes(converted, reference, path=""):
    """Assert the converted tree matches a freshly-initialized module tree
    leaf-for-leaf (names and shapes). Returns list of mismatch strings."""
    errs = []
    keys_c, keys_r = set(converted), set(reference)
    for k in sorted(keys_c - keys_r):
        errs.append(f"extra:   {path}/{k}")
    for k in sorted(keys_r - keys_c):
        errs.append(f"missing: {path}/{k}")
    for k in sorted(keys_c & keys_r):
        c, r = converted[k], reference[k]
        if isinstance(r, dict):
            errs += check_tree_shapes(c, r, f"{path}/{k}")
        elif tuple(np.shape(c)) != tuple(np.shape(r)):
            errs.append(
                f"shape:   {path}/{k} {np.shape(c)} vs {np.shape(r)}")
    return errs
