"""Golden parity of the offline preprocessing CLIs against the reference's
own scripts: both pipelines (scannet2transform --scaled_image --semantics →
scannet2nerf, exactly as run_scripts/preprocess_scannet.sh chains them) run
as subprocesses on identical copies of a synthetic raw-ScanNet scene, and
every artifact is compared — transforms JSONs, remapped label PNGs, scaled
color JPEGs, and the final NGP-normalized poses + one_m_to_scene_uom."""

import json
import os
import shutil
import subprocess
import sys

import cv2
import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/preprocessing_scripts"
N_FRAMES = 12


def _orthonormal_c2w(pos):
    """Camera at `pos` looking at the origin, OpenCV-style c2w (z forward)."""
    z = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return c2w


def _write_raw_scene(root):
    for d in ("color", "pose", "label-filt", "intrinsic"):
        os.makedirs(os.path.join(root, d))
    rng = np.random.default_rng(0)
    k = np.eye(4)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = 1170.0, 1166.0, 647.75, 483.75
    np.savetxt(os.path.join(root, "intrinsic", "intrinsic_color.txt"), k)
    # real ScanNet column ORDER matters: the converters read nyu40id by
    # POSITION (line[4], ref scannet2transform.py:17), the dataset loader
    # by NAME — put nyu40id at index 4 like the shipped tsv
    pd.DataFrame({
        "id": [1, 2, 7, 100],
        "raw_category": ["a", "b", "c", "d"],
        "category": ["a", "b", "c", "d"],
        "count": [1, 1, 1, 1],
        "nyu40id": [5, 2, 40, 11],
        "nyu13id": [1, 1, 1, 1],
    }).to_csv(os.path.join(root, "scannetv2-labels.combined.tsv"), sep="\t",
              index=False)
    h, w = 48, 64
    for i in range(N_FRAMES):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "color", f"{i}.jpg"), img)
        # includes id 3: in LUT range but absent from the tsv — the
        # reference keeps it raw (identity), a zeroing LUT would not
        lab = rng.choice(np.array([0, 1, 2, 3, 7, 100], np.uint16),
                         size=(h, w))
        cv2.imwrite(os.path.join(root, "label-filt", f"{i}.png"), lab)
        ang = 2 * np.pi * i / N_FRAMES
        pos = np.array([2 * np.cos(ang), 2 * np.sin(ang), 1.2])
        np.savetxt(os.path.join(root, "pose", f"{i}.txt"),
                   _orthonormal_c2w(pos))
    # degenerate pose (ScanNet ships some): both converters must skip it
    np.savetxt(os.path.join(root, "pose", "3.txt"), np.full((4, 4), np.inf))


def _run_pipeline(scripts_dir, scene, tsv_in_csv_module=False):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(scripts_dir, "scannet2transform.py"),
         "--scene_folder", scene, "--scaled_image", "--semantics"],
        check=True, capture_output=True, env=env)
    subprocess.run(
        [sys.executable, os.path.join(scripts_dir, "scannet2nerf.py"),
         "--scene_folder", scene, "--transform_train",
         os.path.join(scene, "transforms_train_scaled_semantics_40_raw.json"),
         "--transform_test",
         os.path.join(scene, "transforms_test_scaled_semantics_40_raw.json"),
         "--interval", "10"],
        check=True, capture_output=True, env=env)


@pytest.fixture(scope="module")
def pipelines(tmp_path_factory):
    base = tmp_path_factory.mktemp("raw")
    raw = str(base / "scene0000_00")
    _write_raw_scene(raw)
    ours = str(base / "ours")
    ref = str(base / "ref")
    shutil.copytree(raw, ours)
    shutil.copytree(raw, ref)
    _run_pipeline(os.path.join(REPO, "preprocessing_scripts"), ours)
    _run_pipeline(REF, ref)
    return ours, ref


@pytest.mark.slow
def test_transforms_jsons_match_reference(pipelines):
    ours, ref = pipelines
    for name in ("transforms_train_scaled_semantics_40_raw.json",
                 "transforms_test_scaled_semantics_40_raw.json"):
        with open(os.path.join(ours, name)) as f:
            a = json.load(f)
        with open(os.path.join(ref, name)) as f:
            b = json.load(f)
        for key in ("fl_x", "fl_y", "cx", "cy", "w", "h", "camera_angle_x",
                    "camera_angle_y", "aabb_scale"):
            assert a[key] == b[key], (name, key)
        assert len(a["frames"]) == len(b["frames"]) > 0, name
        for fa, fb in zip(a["frames"], b["frames"]):
            assert os.path.normpath(fa["file_path"]) == \
                os.path.normpath(fb["file_path"])
            assert os.path.normpath(fa["label_path"]) == \
                os.path.normpath(fb["label_path"])
            np.testing.assert_array_equal(fa["transform_matrix"],
                                          fb["transform_matrix"])
        # the inf pose (frame 3) was skipped by both
        names = [os.path.basename(f["file_path"]) for f in a["frames"]]
        assert "3.jpg" not in names


@pytest.mark.slow
def test_labels_and_images_match_reference(pipelines):
    ours, ref = pipelines
    n_checked = 0
    for sub, exact in (("label_40", True), ("label_40_scaled", True),
                       ("color_scaled", False)):
        files = sorted(os.listdir(os.path.join(ref, sub)))
        assert files == sorted(os.listdir(os.path.join(ours, sub)))
        for fn in files:
            a = cv2.imread(os.path.join(ours, sub, fn), cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(ref, sub, fn), cv2.IMREAD_UNCHANGED)
            if exact:
                np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{fn}")
            else:
                # the reference roundtrips the image through float [0,1] and
                # a double BGR<->RGB swap before the identical INTER_AREA
                # resize; JPEG re-encode of a ±1-quantized source stays close
                assert np.abs(a.astype(np.int32)
                              - b.astype(np.int32)).mean() < 2.0, fn
            n_checked += 1
    assert n_checked >= 3 * (N_FRAMES - 1)
    # unmapped-but-in-range id 3 passed through as raw 3 (identity), and
    # mapped ids landed on their nyu40 targets in both outputs
    lab = cv2.imread(os.path.join(ours, "label_40", "0.png"),
                     cv2.IMREAD_UNCHANGED)
    assert set(np.unique(lab)) <= {0, 5, 2, 3, 40, 11}


@pytest.mark.slow
def test_ngp_normalization_matches_reference(pipelines):
    ours, ref = pipelines
    for name in ("transforms_train.json", "transforms_test.json"):
        with open(os.path.join(ours, name)) as f:
            a = json.load(f)
        with open(os.path.join(ref, name)) as f:
            b = json.load(f)
        assert abs(a["one_m_to_scene_uom"] - b["one_m_to_scene_uom"]) < 1e-12
        assert len(a["frames"]) == len(b["frames"]) > 0
        for fa, fb in zip(a["frames"], b["frames"]):
            assert os.path.normpath(fa["file_path"]) == \
                os.path.normpath(fb["file_path"])
            np.testing.assert_allclose(fa["transform_matrix"],
                                       fb["transform_matrix"], atol=1e-12)
