"""Novel-viewpoint replay: slerp pose generation in predict mode, JSON dump,
and consumption as replay data in a later CL stage (ref: scannet_ngp_joint.py
:229-286, :156-178)."""

import argparse
import json
import os

import numpy as np
import pytest

from ucsa_neural_rendering_tpu.data import ScanNetNGPJoint
from ucsa_neural_rendering_tpu.data.synthetic import write_synthetic_scene_dir
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
from ucsa_neural_rendering_tpu.train import cl_driver

from test_joint_e2e import TinySeg, NUM_CLASSES, make_exp, small_trainer_kwargs

H, W = 24, 32


@pytest.fixture(scope="module")
def scenes_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nv_scenes"))
    for s in ("scene0000_00", "scene0001_00"):
        write_synthetic_scene_dir(root, s, n_frames=5, H=H, W=W)
    return root


def test_predict_mode_generates_interpolated_poses(scenes_root):
    ds = ScanNetNGPJoint(root=scenes_root, scene_list=["scene0000_00"],
                         mode="predict", output_size=(H, W),
                         exp_name="nv_exp", use_novel_viewpoints=True,
                         only_new_scene=True)
    # predict over all 5 frames → 5 interpolated poses (loop closed)
    assert len(ds) == 5
    assert all(ds.viewpoint_is_novel)
    json_path = os.path.join(scenes_root, "scene0000_00", "nv_exp",
                             "novel_viewpoints", "interpolated_data.json")
    assert os.path.isfile(json_path)
    with open(json_path) as f:
        frames = json.load(f)["frames"]
    assert len(frames) == 5
    # interpolated rotations stay orthonormal; translations are midpoints
    p0 = np.array(frames[0]["pose"])
    r = p0[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    # item from a novel viewpoint has no gt label
    item = ds[0]
    assert item["viewpoint_is_novel"] is True
    assert (item["label"] == -1).all()


@pytest.mark.slow
def test_cl_with_novel_viewpoint_replay(scenes_root, tmp_path):
    """Two-stage CL with use_novel_viewpoints: stage 0 dumps novel-view
    renders + json; stage 1's joint dataset replays from them."""
    env = {"results": str(tmp_path / "experiments"), "scannet": scenes_root,
           "scannet_frames_25k": str(tmp_path / "frames25k")}
    os.makedirs(env["scannet_frames_25k"], exist_ok=True)
    exp = make_exp()
    exp["cl"] = {"active": False, "use_novel_viewpoints": True,
                 "replay_buffer_size": 4}
    exp["general"]["checkpoint_load"] = None
    exp["trainer"]["load_from_checkpoint"] = False
    args = argparse.Namespace(exp_name="nv_cl", seed=0, fix_nerf=False,
                              nerf_train_epoch=1, joint_train_epoch=1,
                              project_name="t")
    cfg = RenderConfig(num_steps=16, upsample_steps=16, occ_candidates=32,
                       max_ray_batch=H * W)
    results = cl_driver.main(
        exp, env, args, scene_order=["scene0000_00", "scene0001_00"],
        render_cfg=cfg, val_scene_list=["scene0000_00"],
        trainer_kwargs=small_trainer_kwargs())
    assert len(results) == 2
    # stage 0 produced novel-view renders consumed by stage 1
    nv_dir = os.path.join(scenes_root, "scene0000_00", "nv_cl",
                          "novel_viewpoints")
    assert os.path.isfile(os.path.join(nv_dir, "interpolated_data.json"))
    assert len(os.listdir(os.path.join(nv_dir, "nerf_image"))) == 5
    # and the stage-1 joint dataset actually offered novel-view replay items
    ds = ScanNetNGPJoint(root=scenes_root,
                         scene_list=["scene0000_00", "scene0001_00"],
                         mode="train", output_size=(H, W), exp_name="nv_cl",
                         use_novel_viewpoints=True, only_new_scene=False,
                         replay_buffer_size=4)
    novel_items = [i for i in range(len(ds)) if ds.viewpoint_is_novel[i]]
    assert len(novel_items) >= 1
    item = ds[novel_items[0]]
    assert item["from_old_scene"] is True
    assert item["viewpoint_is_novel"] is True
