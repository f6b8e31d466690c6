"""ScanNet label decoding: three on-disk encodings → 0..40 class maps.

Equivalent of the reference's LabelLoaderAuto
(ref: nr4seg/dataset/label_loader.py:10-79):
  * RGBA  — probability-packed: per RGB channel, low 10 bits (>>6 of uint16
            view) hold a 0..1023 probability, high 6 bits (>>10) the class;
            argmax over the scattered per-class probabilities, +1, with a
            confidence floor → 0.
  * FAST  — plain uint8 class map.
  * MAPPED— uint16 raw ScanNet ids remapped through the
            scannetv2-labels.combined.tsv id → nyu40id table.
Vectorized numpy throughout (the reference loops channels over a dense
HxWx40 buffer; here the argmax is computed via a max-reduce over 3 packed
channels without materializing the 40-class volume).
"""

import os

import numpy as np


def _read_label_image(path: str) -> np.ndarray:
    """Depth-preserving image read. imageio/PIL silently downconverts 16-bit
    RGBA PNGs to 8-bit, destroying the probability packing — cv2 with
    IMREAD_UNCHANGED keeps the uint16 payload (channels reordered BGR(A) →
    RGB(A) to match the packing convention)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        import imageio.v2 as imageio
        return imageio.imread(path)
    if img.ndim == 3 and img.shape[2] >= 3:
        order = [2, 1, 0] + ([3] if img.shape[2] == 4 else [])
        img = img[:, :, order]
    return img


class LabelLoaderAuto:

    def __init__(self, root_scannet: str | None = None, confidence: float = 0):
        assert root_scannet is not None
        self.confidence = confidence
        self.max_classes = 40
        self._mapping = self._load_mapping(root_scannet)

    @staticmethod
    def _load_mapping(root: str) -> np.ndarray:
        import pandas
        tsv = os.path.join(root, "scannetv2-labels.combined.tsv")
        df = pandas.read_csv(tsv, sep="\t")
        src = np.asarray(df["id"], dtype=np.int64)
        tgt = np.asarray(df["nyu40id"], dtype=np.int64)
        mapping = np.zeros(int(src.max()) + 1, dtype=np.int64)
        mapping[src] = tgt
        return mapping

    def get(self, path: str):
        img = _read_label_image(path)
        if img.ndim == 3:
            if img.shape[2] != 4:
                raise ValueError(f"unknown label format {img.shape} at {path}")
            return self._decode_rgba(img), "RGBA"
        if img.ndim == 2 and img.dtype == np.uint8:
            return img.astype(np.int32), "FAST"
        if img.ndim == 2 and img.dtype == np.uint16:
            label = self._mapping[img.astype(np.int64)]
            return label.astype(np.int32), "MAPPED"
        raise ValueError(f"unknown label format {img.shape}/{img.dtype} "
                         f"at {path}")

    def _decode_rgba(self, img: np.ndarray) -> np.ndarray:
        chans = img[:, :, :3].astype(np.uint16)
        probs = (chans & np.uint16(0x3FF)).astype(np.float32) / 1023.0
        classes = (chans >> 10).astype(np.int64)  # [H, W, 3]
        # exactly the reference's decode (ref label_loader.py:29-37): the 3
        # channels scatter into a 40-class volume IN CHANNEL ORDER — a later
        # channel overwrites an earlier one carrying the same class — then
        # the volume argmaxes (ties break to the LOWEST class id). A
        # per-channel argmax diverges on quantized-probability ties and on
        # duplicate classes across channels.
        h, w, _ = chans.shape
        # the 6-bit class field can encode 40-63; route out-of-range ids to
        # prob 0 instead of crashing the scatter (the reference's
        # np.eye(40)[cls] would IndexError on the same corrupt file)
        oob = classes >= self.max_classes
        classes = np.minimum(classes, self.max_classes - 1)
        probs = np.where(oob, 0.0, probs)
        vol = np.zeros((h, w, self.max_classes), np.float32)
        np.put_along_axis(vol, classes, probs, axis=2)
        best_prob = vol.max(axis=2)
        label = (vol.argmax(axis=2) + 1).astype(np.int32)
        label[best_prob < self.confidence] = 0
        return label

    def get_probs(self, path: str) -> np.ndarray:
        """Full HxWx40 probability volume of an RGBA-packed label."""
        img = _read_label_image(path)
        assert img.ndim == 3 and img.shape[2] == 4
        h, w, _ = img.shape
        chans = img[:, :, :3].astype(np.uint16)
        probs3 = (chans & np.uint16(0x3FF)).astype(np.float32) / 1023.0
        classes = (chans >> 10).astype(np.int64)
        out = np.zeros((h, w, self.max_classes), np.float32)
        np.put_along_axis(out, classes, probs3, axis=2)
        return out
