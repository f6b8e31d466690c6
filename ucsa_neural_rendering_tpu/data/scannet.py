"""ScanNet-25k frames dataset (segmentation pretraining / replay source).

Equivalent of the reference's `ScanNet`
(ref: nr4seg/dataset/scannet.py:19-137): per-frame jpg + label png (path
substitution color→label, jpg→png), LabelLoaderAuto decode, augmentation,
label−1 shift (0 → −1 ignore), and resample-on-reject when fewer than 10
pixels are labeled. Returns (img [H,W,3] f32 in [0,1], label [H,W] int32,
img_ori) — images NHWC (TPU layout), no normalization (the reference feeds
raw 0-1 images to DeepLab).

Aux labels (ref scannet.py:64-137,155-234): the reference carries an
optional second "auxiliary" label stream (pseudo-labels from a previous CL
stage) per frame — dormant in its live path (`aux_labels = False` is
hardcoded and no lightning module flips it) but part of the dataset's
surface. `enable_aux_labels(paths)` turns it on here: items grow to
(img, label, aux_label, aux_valid, img_ori), the aux label rides the SAME
augmentation stream as the main label (identical crop/flip), and
RGBA prob-packed aux files are pre-converted once to FAST-format `_.png`
(uint8 argmax at the configured confidence) for cheap epoch loads — the
reference's `_preprocessing_hack` without the 16-process fork storm.
`set_aux_labels_fake(True)` mirrors the reference's fake mode (main label
echoed with valid=False).
"""

import os

import imageio.v2 as imageio
import numpy as np

from .augmentation import augment_jit, rescale_to_canonical
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
        img_j, labels_j = augment_jit(
            jax.random.key(seed), jnp.asarray(img),
            [jnp.asarray(l) for l in labels],
            out_hw=tuple(out_hw), only_crop=only_crop)
        return (np.asarray(img_j),
                [np.asarray(l) for l in labels_j])


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def _fast_tag(confidence):
    """Suffix tag for converted aux labels. The conversion bakes the
    loader's confidence floor into the stored argmax, so the tag encodes it
    — a run with a different `confidence_aux` converts fresh instead of
    silently reusing a stale file (the reference regenerates via force=True;
    ref scannet.py:162)."""
    return "_" if confidence == 0 else f"_c{confidence:g}_"


def preprocess_aux_labels(paths, loader):
    """One-time RGBA→FAST conversion (ref scannet.py:155-234): decode each
    RGBA prob-packed aux label once, write the argmax (at the loader's
    confidence floor) as a plain uint8 `<tag>.png` that FAST-decodes on
    every later epoch. Returns the swapped path list. Paths already
    converted (or not RGBA-format) pass through untouched; missing files
    are left for __getitem__'s fallback."""
    out = []
    tag = _fast_tag(loader.confidence)
    for p in paths:
        if p.endswith(tag + ".png") or not os.path.isfile(p):
            out.append(p)
            continue
        fast_p = p[:-len(".png")] + tag + ".png"
        if not os.path.isfile(fast_p):
            label, method = loader.get(p)
            if method != "RGBA":  # already cheap to load; keep as-is
                out.append(p)
                continue
            imageio.imwrite(fast_p, label.astype(np.uint8))
        out.append(fast_p)
    return out


class ScanNet:

    def __init__(self, root, img_list, mode="train", output_size=(240, 320),
                 degrees=10, flip_p=0.5, jitter_bcsh=(0.3, 0.3, 0.3, 0.05),
                 data_augmentation=True, seed=0, confidence_aux=0):
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
        self._label_loader = LabelLoaderAuto(root_scannet=root,
                                             confidence=confidence_aux)
        self._epoch = 0
        self.aux_labels = False
        self.aux_labels_fake = False
        self.aux_label_pths = None

    def enable_aux_labels(self, aux_label_pths):
        """Attach a per-frame auxiliary label stream (pseudo-labels from an
        earlier CL stage). RGBA prob-packed files are converted once to
        FAST-format `_.png` siblings (ref `_preprocessing_hack`)."""
        assert len(aux_label_pths) == len(self.image_pths)
        self.aux_label_pths = preprocess_aux_labels(
            [str(p) for p in aux_label_pths], self._label_loader)
        self.aux_labels = True
        self.aux_labels_fake = False

    def set_aux_labels_fake(self, flag=True):
        """Ref scannet.py:71-73: aux slot filled with the main label and
        valid=False (keeps collate shapes stable when a CL stage has no
        pseudo-labels yet)."""
        self.aux_labels_fake = flag
        self.aux_labels = flag

    def __len__(self):
        return len(self.image_pths)

    def set_epoch(self, epoch: int):
        """Pin the augmentation epoch: all randomness in __getitem__ is a
        pure function of (seed, epoch, index), so a resumed run replays the
        exact augmentation stream of an uninterrupted one (the reference's
        global-torch-RNG stream is NOT resumable)."""
        self._epoch = int(epoch)

    def _read_aux(self, index):
        """Aux label plane, preferring the FAST-converted `_.png` with the
        reference's fallback to the unconverted source (ref scannet.py:
        83-97)."""
        p = self.aux_label_pths[index]
        tag = _fast_tag(self._label_loader.confidence)
        if not os.path.isfile(p) and p.endswith(tag + ".png"):
            p = p[:-len(tag + ".png")] + ".png"
        if not os.path.isfile(p):
            raise FileNotFoundError(
                f"aux label missing for frame {index}: neither "
                f"{self.aux_label_pths[index]} nor its unconverted source "
                f"exists")
        aux, _ = self._label_loader.get(p)
        return aux.astype(np.float32)

    def _load(self, index, aug_seed):
        label, _ = self._label_loader.get(self.label_pths[index])
        labels = [label.astype(np.float32)]  # 0..40, 0 = unlabeled
        if self.aux_labels and not self.aux_labels_fake:
            labels.append(self._read_aux(index))
        img = imageio.imread(self.image_pths[index]).astype(np.float32) / 255.0

        img, labels = rescale_to_canonical(img, labels, self._output_size)
        train = "train" in self._mode and self._data_augmentation
        # one augmentation stream for every label plane: aux gets the exact
        # crop/flip of the main label (ref augments label as a list too)
        img, labels = _host_augment(aug_seed, img, labels,
                                    self._output_size, only_crop=not train)
        labels = [l.astype(np.int64) - 1 for l in labels]  # −1 ignore
        return img, labels

    def __getitem__(self, index):
        rng = np.random.default_rng((self._seed, self._epoch, index))
        img, labels = self._load(index, int(rng.integers(0, 2 ** 31)))
        # resample-on-reject (ref scannet.py:116-121) keyed on the MAIN
        # label, bounded + driven by the same per-(epoch, index) stream so
        # redirect chains can't cycle
        for _ in range(16):
            if (labels[0] != -1).sum() >= 10:
                break
            j = int(rng.integers(0, len(self)))
            img, labels = self._load(j, int(rng.integers(0, 2 ** 31)))
        img = img.astype(np.float32)
        ret = (img, labels[0].astype(np.int32))
        if self.aux_labels:
            if self.aux_labels_fake:
                ret += (labels[0].astype(np.int32), False)
            else:
                ret += (labels[1].astype(np.int32), True)
        return ret + (img,)

    def __str__(self):
        return (f"ScanNet25k[{len(self)} samples, mode={self._mode}, "
                f"aug={self._data_augmentation}]")
