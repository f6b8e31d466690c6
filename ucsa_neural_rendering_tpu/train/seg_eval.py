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

from ..data import ScanNet, load_split
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
    return ScanNet(root=env["scannet_frames_25k"], img_list=split["test"],
                   mode="test", output_size=output_size)


def eval_25k(infer, dataset, num_classes, batch_size=8):
    """Run `infer(images [B,H,W,3]) -> preds [B,H,W]` over the dataset in
    static-shape batches; returns (mIoU, total_acc, mean_acc)."""
    meter = SemanticsMeter(num_classes)
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = [(start + j) % n for j in range(batch_size)]
        items = [dataset[i] for i in idx]
        real = min(batch_size, n - start)
        images = jnp.asarray(np.stack([it[0] for it in items]))
        labels = np.stack([np.asarray(it[1]) for it in items])
        labels[real:] = -1  # wraparound pads: ignored by the meter
        preds = infer(images)
        meter.update(preds, jnp.asarray(labels))
    return meter.measure()
