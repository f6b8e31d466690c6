"""Checkpoint save/load roundtrips (orbax) + torch-checkpoint ingestion."""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.train.checkpoints import (load_deeplab,
                                                         load_tree,
                                                         save_deeplab,
                                                         save_tree)


def test_tree_roundtrip(tmp_path, rng):
    tree = {"a": rng.normal(size=(4, 3)).astype(np.float32),
            "nested": {"b": np.arange(5), "epoch": np.int64(7)}}
    p = str(tmp_path / "ckpt")
    save_tree(p, tree)
    out = load_tree(p)
    np.testing.assert_allclose(out["a"], tree["a"])
    np.testing.assert_array_equal(out["nested"]["b"], tree["nested"]["b"])
    assert int(out["nested"]["epoch"]) == 7


def test_save_overwrites(tmp_path):
    p = str(tmp_path / "ckpt")
    save_tree(p, {"x": np.zeros(3)})
    save_tree(p, {"x": np.ones(3)})
    np.testing.assert_allclose(load_tree(p)["x"], 1.0)


def test_save_tree_write_then_swap(tmp_path):
    """Overwrite is write-then-swap: no leftover .tmp dir after a clean
    save, and a pre-existing stale .tmp (crashed earlier save) is cleared —
    the previous checkpoint stays valid until the new one fully lands."""
    import os
    p = str(tmp_path / "ckpt")
    save_tree(p, {"x": np.zeros(3)})
    os.makedirs(p + ".tmp/garbage")  # simulate a crash mid-save
    save_tree(p, {"x": np.ones(3)})
    assert not os.path.exists(p + ".tmp")
    np.testing.assert_allclose(load_tree(p)["x"], 1.0)


def test_deeplab_roundtrip_and_torch_path(tmp_path, rng):
    params = {"backbone": {"conv1": {"kernel":
                                     rng.normal(size=(7, 7, 3, 64)).astype(
                                         np.float32)}}}
    stats = {"backbone": {"bn1": {"mean": np.zeros(64, np.float32),
                                  "var": np.ones(64, np.float32)}}}
    p = str(tmp_path / "dl")
    save_deeplab(p, params, stats)
    p2, s2 = load_deeplab(p)
    np.testing.assert_allclose(p2["backbone"]["conv1"]["kernel"],
                               params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(s2["backbone"]["bn1"]["var"], 1.0)


def test_load_deeplab_torch_file(tmp_path, rng):
    """A torch .ckpt file routes through the converter (aux strip included)."""
    import torch
    from test_deeplab import fake_torchvision_state_dict

    sd = fake_torchvision_state_dict(rng, with_aux=True,
                                     lightning_prefix="_model._model.")
    ckpt = {"state_dict": {k: torch.from_numpy(np.asarray(v, np.float32))
                           for k, v in sd.items()}}
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)
    params, stats = load_deeplab(path)
    assert "backbone" in params and "aspp" in params
    assert params["classifier"]["kernel"].shape == (1, 1, 256, 40)
