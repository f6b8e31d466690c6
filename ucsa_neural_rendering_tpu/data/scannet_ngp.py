"""Per-scene NeRF-render dataset (fine-tuning on rendered pseudo-labels).

Equivalent of the reference's `ScanNetNGP`
(ref: nr4seg/dataset/scannet_ngp.py:17-202): per-scene 80/20 train/val split
by sorted frame index; image/label source selected by `train_image` /
`train_label` ("gt" | "nerf" | "half") and `val_mode`
("gtgt" | "nerfgt" | "nerfnerf"); resize to 320x240.

Label convention note: GT `label_scaled` stores NYU ids 0..40 (0=unlabeled)
and is shifted −1 on load. NeRF-rendered labels were stored as class+1 by
the predict step, so they are also shifted −1 — the reference instead adds
+1 before its common −1 (scannet_ngp.py:164-166), which would leave NeRF
labels in 1..40 and overflow a 40-way loss; we use the consistent convention
(matching the reference's own joint-dataset loader,
scannet_ngp_joint.py:302-308) and record the divergence.
"""

import os
from glob import glob

import cv2
import numpy as np

from . import native_loader
from .scannet import _host_augment


class ScanNetNGP:

    def __init__(self, root, scene_list, prev_exp_name="one_step_nerf_only",
                 mode="train", train_image="nerf", train_label="nerf",
                 val_mode="gtgt", output_size=(240, 320), degrees=10,
                 flip_p=0.5, jitter_bcsh=(0.3, 0.3, 0.3, 0.05), sub=1,
                 data_augmentation=True, seed=0):
        self._mode = mode
        self._sub = sub
        self.H, self.W = output_size
        self.root = root
        self.train_image = train_image
        self.train_label = train_label
        self.val_mode = val_mode
        self._data_augmentation = data_augmentation
        self._rng = np.random.default_rng(seed)

        self.image_pths, self.img_num = self._get_image_pths(scene_list)
        sub_nerf = lambda p, d: p.replace(
            "color_scaled", os.path.join(prev_exp_name, d)).replace(
                ".jpg", ".png")
        self.image_gt_pths = self.image_pths
        self.image_nerf_pths = [sub_nerf(p, "nerf_image")
                                for p in self.image_pths]
        self.label_nerf_pths = [sub_nerf(p, "nerf_label")
                                for p in self.image_pths]
        self.label_mapping_pths = [
            p.replace("color_scaled", "mapping_label").replace(".jpg", ".png")
            for p in self.image_pths
        ]
        self.label_gt_pths = [
            p.replace("color_scaled", "label_scaled").replace(".jpg", ".png")
            for p in self.image_pths
        ]

    def _get_image_pths(self, scene_list, val_ratio=0.2):
        """Sorted frames per scene; val = last 20% (ref :90-106)."""
        img_list, img_num = [], []
        for scene_name in scene_list:
            all_imgs = sorted(
                glob(os.path.join(self.root, scene_name, "color_scaled",
                                  "*jpg")),
                key=lambda x: int(os.path.basename(x)[:-4]))
            n_val = int(len(all_imgs) * val_ratio)
            if self._mode == "train":
                sel = all_imgs[:-n_val] if n_val else all_imgs
                sel = sel[::self._sub]
                img_num.append(len(sel))
            else:
                sel = all_imgs[-n_val:][::self._sub] if n_val else []
            img_list.extend(sel)
        return img_list, img_num

    def __len__(self):
        return len(self.image_pths)

    def _read_rgb(self, path):
        out = native_loader.load_rgb(path, self.W, self.H)
        if out is not None:
            return out
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return cv2.resize(img, (self.W, self.H), interpolation=cv2.INTER_AREA)

    def _read_label(self, path, is_nerf):
        out = native_loader.load_label(path, self.W, self.H)
        if out is not None:
            return out.astype(np.float32)
        label = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        label = cv2.resize(label, (self.W, self.H),
                           interpolation=cv2.INTER_NEAREST)
        return label.astype(np.float32)  # storage space: 0 unknown / id = c+1

    def __getitem__(self, index):
        if self._mode == "train":
            if self.train_image == "gt":
                img = self._read_rgb(self.image_gt_pths[index])
            elif self.train_image == "nerf":
                img = self._read_rgb(self.image_nerf_pths[index])
            elif self.train_image == "half":
                src = (self.image_gt_pths if self._rng.random() > 0.5
                       else self.image_nerf_pths)
                img = self._read_rgb(src[index])
            else:
                raise NotImplementedError(self.train_image)
            if self.train_label == "nerf":
                label = self._read_label(self.label_nerf_pths[index], True)
            else:
                label = self._read_label(self.label_mapping_pths[index], False)
        else:
            if self.val_mode == "gtgt":
                img = self._read_rgb(self.image_gt_pths[index])
            elif self.val_mode in ("nerfgt", "nerfnerf"):
                img = self._read_rgb(self.image_nerf_pths[index])
            else:
                raise NotImplementedError(self.val_mode)
            if self.val_mode in ("gtgt", "nerfgt"):
                label = self._read_label(self.label_gt_pths[index], False)
            else:
                label = self._read_label(self.label_nerf_pths[index], True)

        train = self._mode == "train" and self._data_augmentation
        img, labels = _host_augment(int(self._rng.integers(0, 2 ** 31)), img,
                                    [label], (self.H, self.W),
                                    only_crop=not train)
        label = labels[0].astype(np.int64) - 1

        ret = (img.astype(np.float32), label.astype(np.int32),
               img.astype(np.float32))
        if self._mode != "train":
            scene = os.path.normpath(
                self.image_pths[index]).split(os.path.sep)[-3]
            ret += (scene,)
        return ret
