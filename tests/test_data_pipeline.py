"""Dataset / loader / augmentation tests on the synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from ucsa_neural_rendering_tpu.data import (DataLoader, LabelLoaderAuto,
                                            ScanNet, ScanNetCLJoint,
                                            ScanNetNGP, ScanNetNGPJoint,
                                            create_split, nerf_matrix_to_ngp)
from ucsa_neural_rendering_tpu.data.synthetic import (
    write_synthetic_25k_dir, write_synthetic_scene_dir)

H, W = 32, 40


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scenes"))
    write_synthetic_scene_dir(root, "scene0000_00", n_frames=6, H=H, W=W)
    write_synthetic_scene_dir(root, "scene0001_00", n_frames=6, H=H, W=W)
    return root


@pytest.fixture(scope="module")
def frames25k_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("frames25k"))
    paths = write_synthetic_25k_dir(root, n_scenes=2, n_frames_per_scene=3,
                                    H=2 * H, W=2 * W)
    return root, paths


def test_label_loader_fast_format(frames25k_dir):
    root, paths = frames25k_dir
    loader = LabelLoaderAuto(root_scannet=root)
    label, method = loader.get(
        paths[0].replace("color", "label").replace("jpg", "png"))
    assert method == "FAST"
    assert label.min() >= 0 and label.max() <= 40


def test_scannet25k_dataset(frames25k_dir):
    root, paths = frames25k_dir
    ds = ScanNet(root=root, img_list=paths, mode="train",
                 output_size=(H, W))
    img, label, ori = ds[0]
    assert img.shape == (H, W, 3) and img.dtype == np.float32
    assert label.shape == (H, W) and label.dtype == np.int32
    assert label.min() >= -1 and label.max() < 40
    assert 0.0 <= img.min() and img.max() <= 1.0
    # val path (no augmentation) is deterministic
    ds_val = ScanNet(root=root, img_list=paths, mode="val",
                     output_size=(H, W))
    a = ds_val[0]
    b = ds_val[0]
    np.testing.assert_array_equal(a[0], b[0])


def test_scannet_ngp_joint_item(scene_dir):
    ds = ScanNetNGPJoint(root=scene_dir, scene_list=["scene0000_00"],
                         mode="train", output_size=(H, W),
                         exp_name="exp_test")
    assert len(ds) == 5  # 6 frames − 20% val (1 frame)
    item = ds[0]
    assert item["img"].shape == (H, W, 3)
    assert item["label"].shape == (H, W)
    assert item["depth"].shape == (H, W)
    assert item["pose"].shape == (4, 4)
    assert item["from_old_scene"] is False
    assert item["current_scene_name"] == "scene0000_00"
    # depth roundtrip (mm png) ≈ analytic depth
    assert 0.5 < item["depth"].mean() < 5.0
    # pose went through nerf_matrix_to_ngp: rotation stays orthonormal
    r = item["pose"][:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_scannet_ngp_joint_pose_roundtrip(scene_dir):
    """Pose stored in transforms_train.json must map back to the NGP pose the
    fixture rendered with."""
    from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
    frames, _ = make_synthetic_scene(6, H, W)
    with open(os.path.join(scene_dir, "scene0000_00",
                           "transforms_train.json")) as f:
        meta = json.load(f)
    stored = np.array(meta["frames"][0]["transform_matrix"], np.float32)
    np.testing.assert_allclose(nerf_matrix_to_ngp(stored),
                               frames[0]["pose"], atol=1e-5)


def test_scannet_ngp_joint_val_split(scene_dir):
    ds_val = ScanNetNGPJoint(root=scene_dir, scene_list=["scene0000_00"],
                             mode="val", output_size=(H, W),
                             exp_name="exp_test", only_new_scene=False,
                             val_scene_list=["scene0000_00", "scene0001_00"])
    assert len(ds_val) == 2  # 1 val frame per scene x 2 scenes
    item = ds_val[0]
    assert item["from_old_scene"] is False


def test_joint_collate_three_way(scene_dir):
    ds = ScanNetNGPJoint(root=scene_dir, scene_list=["scene0000_00"],
                         mode="train", output_size=(H, W),
                         exp_name="exp_test")
    items = [ds[0], ds[1]]
    items[0]["replay_img"] = np.zeros((1, H, W, 3), np.float32)
    items[0]["replay_label"] = np.zeros((1, H, W), np.int32)
    batch_old, batch_new, batch_cl = ScanNetNGPJoint.collate(items)
    assert batch_old is None
    assert batch_new["img"].shape == (2, H, W, 3)
    assert batch_cl["replay_img"].shape == (1, 1, H, W, 3)


def test_cl_joint_mixer(scene_dir, frames25k_dir):
    root25k, paths = frames25k_dir
    ds25k = ScanNet(root=root25k, img_list=paths, mode="train",
                    output_size=(H, W))
    ngp = ScanNetNGPJoint(root=scene_dir, scene_list=["scene0000_00"],
                          mode="train", output_size=(H, W),
                          exp_name="exp_test")
    mixed = ScanNetCLJoint(ds25k, ngp, ngp_25k_ratio=2)
    item = mixed[0]
    assert item["replay_img"].shape == (2, H, W, 3)
    assert item["replay_label"].shape == (2, H, W)


def test_scannet_ngp_finetune(scene_dir):
    ds = ScanNetNGP(root=scene_dir, scene_list=["scene0000_00"], mode="val",
                    val_mode="gtgt", output_size=(H, W))
    img, label, ori, scene = ds[0]
    assert scene == "scene0000_00"
    assert label.min() >= -1 and label.max() < 40


def test_dataloader_shuffle_and_collate(frames25k_dir):
    root, paths = frames25k_dir
    ds = ScanNet(root=root, img_list=paths, mode="val", output_size=(H, W))
    dl = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == len(ds) // 3
    img, label, ori = batches[0]
    assert img.shape == (3, H, W, 3)
    assert label.shape == (3, H, W)


def test_create_split(frames25k_dir):
    root, paths = frames25k_dir
    split = create_split(root, val_ratio=0.5, seed=0)
    assert len(split["val"]) == len(paths) // 2
    assert set(split["test"]) == set(split["val"])
    assert len(split["train"]) + len(split["val"]) == len(paths)


def test_scannet_aux_labels(frames25k_dir, tmp_path):
    """Aux-label stream (ref scannet.py:64-137,155-234): fake mode echoes
    the main label with valid=False; real mode pre-converts RGBA
    prob-packed files to FAST `_.png` and returns the aux plane through
    the same crop as the main label."""
    root, paths = frames25k_dir

    ds = ScanNet(root=root, img_list=paths, mode="val", output_size=(H, W))
    ds.set_aux_labels_fake(True)
    img, label, aux, valid, ori = ds[0]
    np.testing.assert_array_equal(aux, label)
    assert valid is False

    # real aux stream: constant class 5 (1-based 6) at full confidence
    import cv2
    aux_paths = []
    for i in range(len(paths)):
        ap = str(tmp_path / f"aux_{i}.png")
        img16 = np.zeros((2 * H, 2 * W, 4), np.uint16)
        img16[..., 0] = (5 << 10) | 1023
        cv2.imwrite(ap, img16[..., [2, 1, 0, 3]])
        aux_paths.append(ap)
    ds2 = ScanNet(root=root, img_list=paths, mode="val", output_size=(H, W))
    ds2.enable_aux_labels(aux_paths)
    assert all(q.endswith("_.png") and os.path.isfile(q)
               for q in ds2.aux_label_pths)
    img, label, aux, valid, ori = ds2[0]
    assert valid is True and aux.shape == (H, W)
    assert (aux == 5).all()  # decoded 6, −1 shift

    # fallback: a missing converted file falls back to the RGBA source
    os.remove(ds2.aux_label_pths[0])
    img, label, aux, valid, ori = ds2[0]
    assert (aux == 5).all()


def test_scannet_aux_confidence_not_stale(frames25k_dir, tmp_path):
    """The RGBA→FAST conversion bakes the confidence floor into the stored
    argmax; a run with a different confidence_aux must convert fresh, not
    reuse the stale file (round-3 review finding — the reference regenerates
    via force=True, ref scannet.py:162)."""
    import cv2
    root, paths = frames25k_dir

    # class 5 at prob ≈0.3 everywhere
    aux_paths = []
    for i in range(len(paths)):
        ap = str(tmp_path / f"aux_{i}.png")
        img16 = np.zeros((2 * H, 2 * W, 4), np.uint16)
        img16[..., 0] = (5 << 10) | int(0.3 * 1023)
        cv2.imwrite(ap, img16[..., [2, 1, 0, 3]])
        aux_paths.append(ap)

    ds0 = ScanNet(root=root, img_list=paths, mode="val", output_size=(H, W),
                  confidence_aux=0)
    ds0.enable_aux_labels(aux_paths)
    _, _, aux0, _, _ = ds0[0]
    assert (aux0 == 5).all()  # no floor: argmax class survives

    ds5 = ScanNet(root=root, img_list=paths, mode="val", output_size=(H, W),
                  confidence_aux=0.5)
    ds5.enable_aux_labels(aux_paths)
    assert ds5.aux_label_pths[0] != ds0.aux_label_pths[0]
    _, _, aux5, _, _ = ds5[0]
    assert (aux5 == -1).all()  # below the floor → unlabeled → ignore


def test_augment_label_value_preservation(rng):
    """Augmentation must not invent label values (nearest interp only)."""
    import jax
    from ucsa_neural_rendering_tpu.data.augmentation import augment

    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    label = rng.integers(0, 7, (H, W)).astype(np.float32)
    out_img, out_labels = augment(jax.random.key(0), img, [label],
                                  out_hw=(24, 32))
    vals = set(np.unique(np.asarray(out_labels[0])).astype(int))
    assert vals.issubset(set(range(0, 7)) | {0})
    assert out_img.shape == (24, 32, 3)
    assert 0.0 <= float(np.min(out_img)) and float(np.max(out_img)) <= 1.0


def test_augment_only_crop_deterministic(rng):
    import jax
    from ucsa_neural_rendering_tpu.data.augmentation import augment

    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    label = rng.integers(0, 7, (H, W)).astype(np.float32)
    a = augment(jax.random.key(0), img, [label], out_hw=(24, 32),
                only_crop=True)
    b = augment(jax.random.key(5), img, [label], out_hw=(24, 32),
                only_crop=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # center crop of identity-size == identity
    c = augment(jax.random.key(0), img, [label], out_hw=(H, W),
                only_crop=True)
    np.testing.assert_array_equal(np.asarray(c[0]), img)


def test_rescale_to_canonical_size_matches_torch_floor():
    """The reference's interpolate(scale_factor, recompute_scale_factor=
    False) FLOORS the output size (round-3 review finding: round() grew the
    canvas 1px on the standard 968x1296 frames, shifting crop offsets)."""
    import torch
    from ucsa_neural_rendering_tpu.data.augmentation import \
        rescale_to_canonical

    h, w, oh, ow = 968, 1296, 240, 320
    out_img, out_labs = rescale_to_canonical(
        np.zeros((h, w, 3), np.float32), [np.zeros((h, w), np.float32)],
        (oh, ow))
    sf = max(oh / h, ow / w) * 1.2
    ref = torch.nn.functional.interpolate(
        torch.zeros(1, 3, h, w), scale_factor=(sf, sf), mode="bilinear",
        recompute_scale_factor=False, align_corners=False)
    assert out_img.shape[:2] == tuple(ref.shape[2:])
    assert out_labs[0].shape == tuple(ref.shape[2:])


def test_scene_palette_variants():
    """Variant 0 is the historic fixture bit-for-bit; variants k>0 have
    identical geometry, family classes (k%7) and per-variant color jitter,
    so a CL sequence over variants measures transfer AND forgetting
    (scripts/exp_synthetic_cl.py — the synthetic stand-in for the
    reference's 10-scene protocol)."""
    from ucsa_neural_rendering_tpu.data.synthetic import (WALL_CLASS,
                                                          WALL_RGB,
                                                          _orbit_pose,
                                                          analytic_frame,
                                                          scene_palette)
    rgb0, cls0 = scene_palette(0)
    np.testing.assert_array_equal(rgb0, WALL_RGB)
    np.testing.assert_array_equal(cls0, WALL_CLASS)
    intr = np.array([0.75 * W, 0.75 * W, W / 2, H / 2], np.float32)
    pose = _orbit_pose(0.3, 0.4)
    img0, lab0, dep0 = analytic_frame(pose, intr, H, W)
    seen = set(np.unique(lab0))
    for k in (1, 2):
        rgb_k, cls_k = scene_palette(k)
        assert len(np.unique(rgb_k.round(4), axis=0)) == 6  # distinct colors
        img_k, lab_k, dep_k = analytic_frame(pose, intr, H, W, variant=k)
        np.testing.assert_array_equal(dep0, dep_k)  # same geometry
        classes = set(np.unique(lab_k))
        assert classes <= set(range(6 * k, 6 * k + 6))
        assert not classes & seen  # no overlap with earlier variants
        seen |= classes
        assert not (img_k == img0).all()
    # determinism: same variant → same palette
    r1a, c1a = scene_palette(1)
    r1b, c1b = scene_palette(1)
    np.testing.assert_array_equal(r1a, r1b)
    np.testing.assert_array_equal(c1a, c1b)
    # family twins (k and k+7): SAME classes, DIFFERENT colors — the
    # pretrain-corpus / CL-scene pairing of exp_synthetic_cl.py
    r8, c8 = scene_palette(8)
    np.testing.assert_array_equal(c1a, c8)
    assert not (r1a == r8).all()


def test_host_augment_does_not_recompile_per_item():
    """Eager per-item augmentation must hit the jit cache after the first
    call: calling `augment` directly retraced its lax.switch branches per
    image (4 fresh executables each), leaking XLA:CPU JIT code maps until
    long pretrain runs SEGFAULTED at vm.max_map_count (round-3 finding).
    `augment_jit` is the cached entry datasets must use."""
    import jax

    from ucsa_neural_rendering_tpu.data.augmentation import augment_jit

    img = np.random.default_rng(0).uniform(0, 1, (48, 64, 3)).astype(
        np.float32)
    labels = [np.zeros((48, 64), np.float32)]
    before = augment_jit._cache_size()  # other tests share the cache
    for seed in range(3):
        out_img, out_labels = augment_jit(
            jax.random.key(seed), img, [np.asarray(l) for l in labels],
            out_hw=(33, 41), only_crop=False)  # unique signature
    assert out_img.shape == (33, 41, 3)
    assert augment_jit._cache_size() == before + 1  # 3 calls, 1 executable
