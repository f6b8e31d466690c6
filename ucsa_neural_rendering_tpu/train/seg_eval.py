"""Shared ScanNet-25k generalization test helpers.

The 25k test phase appears in two places in the reference — finetune runs
`trainer.test` before and after fitting (ref scripts/train_finetune.py:
115-118, nr4seg/lightning/finetune_data_module.py:109-117) and joint
training tests once at the end (ref joint_train_data_module.py:55-66) —
with the same split construction and eval loop. One implementation here,
parameterized by an `infer(images) -> preds` callable so it serves both
SegTrainer (finetune/pretrain) and JointTrainer (joint loop).

Frames are batched per dispatch: through the axon tunnel every jit call
costs ~35 ms of host roundtrip (PERFORMANCE.md), so bs=1 frame loops pay
minutes of pure overhead on thousand-frame splits. The last partial batch
wraps around to keep shapes static (one compile); pad labels of -1 stay
out of the confusion matrix.
"""

import os

import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, ScanNet, load_split
from ..metrics import SemanticsMeter


def build_test_25k(exp, env, output_size):
    """ScanNet-25k test split dataset, or None when the split file isn't
    configured or on disk (the shipped split.npz is a large-blob
    placeholder upstream)."""
    cfg_dm = exp["data_module"]
    split_file = cfg_dm.get("data_preprocessing", {}).get("split_file")
    if not split_file:
        return None
    split_path = os.path.join(env["scannet_frames_25k"], split_file)
    if not os.path.isfile(split_path):
        return None
    split = load_split(split_path)
    if len(split["test"]) == 0:
        # An empty test list would otherwise surface as a meter assertion
        # AFTER training, before checkpoints are written.
        return None
    return ScanNet(root=env["scannet_frames_25k"], img_list=split["test"],
                   mode="test", output_size=output_size)


class _PaddedView:
    """Length-padded (to a batch multiple) view of (img, label) pairs;
    wraparound pads carry all−1 labels so the meter ignores them. Keeps
    every batch the same static shape → one jit compilation."""

    def __init__(self, dataset, total):
        self._ds = dataset
        self._total = total
        self._pad = None

    def __len__(self):
        return self._total

    def __getitem__(self, i):
        if i >= len(self._ds):
            # Pad slots never reach the meter; serve a cached zero image
            # instead of decoding+augmenting a real frame just to mask it.
            if self._pad is None:
                img, label = self[0]
                self._pad = (np.zeros_like(img), np.full_like(label, -1))
            return self._pad
        item = self._ds[i]
        return np.asarray(item[0]), np.asarray(item[1])


def eval_25k(infer, dataset, num_classes, batch_size=8):
    """Run `infer(images [B,H,W,3]) -> preds [B,H,W]` over the dataset in
    static-shape batches; returns (mIoU, total_acc, mean_acc). Decode of
    batch k+1 overlaps inference of batch k (DataLoader thread prefetch)."""
    meter = SemanticsMeter(num_classes)
    n = len(dataset)
    total = -(-n // batch_size) * batch_size
    loader = DataLoader(_PaddedView(dataset, total), batch_size=batch_size)
    for images, labels in loader:
        preds = infer(jnp.asarray(images))
        meter.update(preds, jnp.asarray(labels))
    return meter.measure()
