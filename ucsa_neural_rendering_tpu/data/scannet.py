"""ScanNet-25k frames dataset (segmentation pretraining / replay source).

Equivalent of the reference's `ScanNet`
(ref: nr4seg/dataset/scannet.py:19-137): per-frame jpg + label png (path
substitution color→label, jpg→png), LabelLoaderAuto decode, augmentation,
label−1 shift (0 → −1 ignore), and resample-on-reject when fewer than 10
pixels are labeled. Returns (img [H,W,3] f32 in [0,1], label [H,W] int32,
img_ori) — images NHWC (TPU layout), no normalization (the reference feeds
raw 0-1 images to DeepLab).
"""

import os

import imageio.v2 as imageio
import numpy as np

from .augmentation import augment, rescale_to_canonical
from .label_loader import LabelLoaderAuto


def _host_augment(seed, img, labels, out_hw, only_crop):
    """Run the jax augmentation pipeline on host CPU."""
    import jax
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import jax.numpy as jnp
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        img_j, labels_j = augment(jax.random.key(seed), jnp.asarray(img),
                                  [jnp.asarray(l) for l in labels],
                                  out_hw=out_hw, only_crop=only_crop)
        return (np.asarray(img_j),
                [np.asarray(l) for l in labels_j])


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class ScanNet:

    def __init__(self, root, img_list, mode="train", output_size=(240, 320),
                 degrees=10, flip_p=0.5, jitter_bcsh=(0.3, 0.3, 0.3, 0.05),
                 data_augmentation=True, seed=0):
        self.root = root
        self.image_pths = [str(p) for p in img_list]
        self.label_pths = [
            p.replace("color", "label").replace("jpg", "png")
            for p in self.image_pths
        ]
        self._mode = mode
        self._output_size = tuple(output_size)
        self._data_augmentation = data_augmentation
        self._seed = seed
        self._label_loader = LabelLoaderAuto(root_scannet=root)
        self._epoch = 0

    def __len__(self):
        return len(self.image_pths)

    def set_epoch(self, epoch: int):
        """Pin the augmentation epoch: all randomness in __getitem__ is a
        pure function of (seed, epoch, index), so a resumed run replays the
        exact augmentation stream of an uninterrupted one (the reference's
        global-torch-RNG stream is NOT resumable)."""
        self._epoch = int(epoch)

    def _load(self, index, aug_seed):
        label, _ = self._label_loader.get(self.label_pths[index])
        label = label.astype(np.float32)  # 0..40, 0 = unlabeled
        img = imageio.imread(self.image_pths[index]).astype(np.float32) / 255.0

        img, labels = rescale_to_canonical(img, [label], self._output_size)
        train = "train" in self._mode and self._data_augmentation
        img, labels = _host_augment(aug_seed, img, labels,
                                    self._output_size, only_crop=not train)
        label = labels[0].astype(np.int64) - 1  # −1 ignore, 0..39 classes
        return img, label

    def __getitem__(self, index):
        rng = np.random.default_rng((self._seed, self._epoch, index))
        img, label = self._load(index, int(rng.integers(0, 2 ** 31)))
        # resample-on-reject (ref scannet.py:116-121), bounded + driven by
        # the same per-(epoch, index) stream so redirect chains can't cycle
        for _ in range(16):
            if (label != -1).sum() >= 10:
                break
            j = int(rng.integers(0, len(self)))
            img, label = self._load(j, int(rng.integers(0, 2 ** 31)))
        return (img.astype(np.float32), label.astype(np.int32),
                img.astype(np.float32))

    def __str__(self):
        return (f"ScanNet25k[{len(self)} samples, mode={self._mode}, "
                f"aug={self._data_augmentation}]")
