"""Checkpoint save/load: orbax for native trees, torch-ckpt ingestion.

Replaces the reference's Lightning ModelCheckpoint + manual torch.save
chaining (ref: scripts/pretrain.py:70-78, scripts/train_joint.py:183-186,
scripts/cl_deeplab.py:76-86): each continual-learning stage saves the
segmentation params as `deeplab_ckpt/` and the next stage loads it; the
initial stage may instead load a torchvision/Lightning .ckpt through the
weight converter (checkpoint surgery included). All trees are saved with
orbax StandardCheckpointer (resumable, async-capable).
"""

import os

import jax
import numpy as np

# orbax is imported lazily inside the save/load functions: importing it
# initializes the jax device backend, which on axon-TPU hosts can block on
# the remote chip service — `scripts/*.py --help` and other light imports
# must not touch devices.


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_tree(path: str, tree):
    """Save a pytree of arrays at `path` (a directory).

    Write-then-swap: the tree lands in a sibling `.tmp` dir first; the old
    checkpoint is then renamed aside (one syscall), the new one renamed in,
    and only then is the old one deleted — so at every instant either the
    old or the new checkpoint exists at `path` up to a microseconds-wide
    rename window (an rmtree-at-`path` window would be seconds for a
    multi-hundred-MB orbax dir). The per-epoch `last_ckpt` is the resume
    anchor — losing it silently restarts training from epoch 0."""
    import shutil
    ckpt = _ocp().StandardCheckpointer()
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    ckpt.save(tmp, jax.tree.map(np.asarray, tree))
    ckpt.wait_until_finished()
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def load_tree(path: str, target=None):
    """Restore a pytree. With `target` (a pytree of like-shaped arrays), the
    restored tree keeps target's STRUCTURE — required for optax opt_states,
    whose NamedTuple nesting orbax flattens to dicts otherwise."""
    ckpt = _ocp().StandardCheckpointer()
    if target is None:
        return ckpt.restore(os.path.abspath(path))
    return ckpt.restore(os.path.abspath(path), target)


def save_deeplab(path: str, params, batch_stats):
    """Stage-chaining seg checkpoint (the reference's `deeplab.ckpt`)."""
    save_tree(path, {"params": params, "batch_stats": batch_stats})


def load_deeplab(path: str):
    """Load seg weights from either an orbax dir (ours) or a torch .ckpt/.pth
    (reference pretrained checkpoint, with aux-head surgery)."""
    if os.path.isdir(path):
        tree = load_tree(path)
        return tree["params"], tree["batch_stats"]
    from ..models.torch_converter import convert_deeplab_checkpoint
    return convert_deeplab_checkpoint(path)
