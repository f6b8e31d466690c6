"""Continual-learning replay mixers over the 25k dataset.

Equivalents of the reference's `ScanNetCL` / `ScanNetCLJoint`
(ref: nr4seg/dataset/scannet_cl.py:11-82, scannet_cl_joint.py:8-47): wrap a
per-scene dataset and attach `ngp_25k_ratio` random ScanNet-25k frames to
every item as replay images/labels. The reference's `ScanNetCLJoint.collate`
is dead/broken code (scannet_cl_joint.py:49-67); the real collate lives on
the joint dataset — same here.
"""

import numpy as np


class _EpochMixin:
    """set_epoch support shared by the mixers: forward to both wrapped
    datasets (the 25k dataset's augmentation stream is a pure function of
    (seed, epoch, index) and would otherwise stay frozen at epoch 0 — the
    DataLoader only propagates set_epoch to its direct dataset), and re-key
    the replay-draw RNG from (seed, epoch) so replay selection replays
    identically on resume."""

    def set_epoch(self, epoch: int):
        for ds in (self.scannet_25k, self.scannet_ngp):
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)
        self._rng = np.random.default_rng((self._seed, int(epoch)))


class ScanNetCLJoint(_EpochMixin):
    """Joint-training wrapper: item dict + replay_img/replay_label stacks."""

    def __init__(self, scannet_25k, scannet_ngp, ngp_25k_ratio=1, seed=0):
        self.scannet_25k = scannet_25k
        self.scannet_ngp = scannet_ngp
        self.ngp_25k_ratio = ngp_25k_ratio
        self._seed = seed
        self._rng = np.random.default_rng((seed, 0))

    def __len__(self):
        return len(self.scannet_ngp)

    def __getitem__(self, index):
        ret = self.scannet_ngp[index]
        imgs, labels = [], []
        for _ in range(self.ngp_25k_ratio):
            rid = int(self._rng.integers(0, len(self.scannet_25k)))
            img, label, _ = self.scannet_25k[rid]
            imgs.append(img)
            labels.append(label)
        ret["replay_img"] = np.stack(imgs, 0)
        ret["replay_label"] = np.stack(labels, 0)
        return ret

    @property
    def collate(self):
        return self.scannet_ngp.collate


class ScanNetCL(_EpochMixin):
    """Finetune wrapper: flattens (scene item + replay items) into one batch
    at collate time (ref scannet_cl.py:50-79)."""

    def __init__(self, scannet_25k, scannet_ngp, ngp_25k_ratio=1, seed=0):
        self.scannet_25k = scannet_25k
        self.scannet_ngp = scannet_ngp
        self.ngp_25k_ratio = ngp_25k_ratio
        self._seed = seed
        self._rng = np.random.default_rng((seed, 0))

    def __len__(self):
        return len(self.scannet_ngp)

    def __getitem__(self, index):
        ret_ngp = self.scannet_ngp[index]
        ret_25k = [self.scannet_25k[int(self._rng.integers(
            0, len(self.scannet_25k)))] for _ in range(self.ngp_25k_ratio)]
        return ret_ngp, ret_25k

    @staticmethod
    def collate(batch):
        imgs, labels, ori = [], [], []
        for ngp_item, replay_items in batch:
            imgs.append(ngp_item[0])
            labels.append(ngp_item[1])
            ori.append(ngp_item[2])
            for it in replay_items:
                imgs.append(it[0])
                labels.append(it[1])
                ori.append(it[2])
        return (np.stack(imgs, 0), np.stack(labels, 0), np.stack(ori, 0))
