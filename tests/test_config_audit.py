"""Config-key coverage: every key in every shipped experiment YAML is
either consumed by its entry point or documented-ignored with a reason;
unknown keys warn instead of being silently dropped (round-3 verdict #7).
Plus the visualization/cadence keys that audit forced into existence:
store_n.test visu in test_nerf and check_val_every_n_epoch in pretrain."""

import glob
import os
import warnings

import numpy as np
import pytest
import yaml

from ucsa_neural_rendering_tpu.config.key_audit import (audit_exp_keys,
                                                        flatten_keys,
                                                        ignored_reason)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ENTRY_BY_DIR = {
    "one_step_joint": "joint",
    "multi_step": "joint",
    "one_step_finetune_nerf": "finetune",
}


def _shipped_cfgs():
    out = []
    for f in glob.glob(os.path.join(REPO, "cfg", "exp", "**", "*.yml"),
                       recursive=True):
        rel = os.path.relpath(f, os.path.join(REPO, "cfg", "exp"))
        d = os.path.dirname(rel)
        entry = _ENTRY_BY_DIR.get(d, "pretrain")
        out.append((rel, f, entry))
    return out


@pytest.mark.parametrize("rel,path,entry",
                         _shipped_cfgs(),
                         ids=[r for r, _, _ in _shipped_cfgs()])
def test_shipped_config_keys_all_recognized(rel, path, entry):
    exp = yaml.safe_load(open(path))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any unknown-key warning fails
        ignored, unknown = audit_exp_keys(exp, entry)
    assert unknown == []
    # every accepted-but-ignored key carries a documented reason
    for k in ignored:
        assert ignored_reason(k), k


def test_unknown_key_warns():
    exp = {"general": {"name": "x"}, "optimizzer": {"lr": 1e-3}}
    with pytest.warns(UserWarning, match="optimizzer.lr"):
        _, unknown = audit_exp_keys(exp, "joint")
    assert unknown == ["optimizzer.lr"]


def test_flatten_keys_handles_empty_and_nested():
    assert sorted(flatten_keys({"a": {"b": 1, "c": {}}, "d": 2})) == \
        ["a.b", "a.c", "d"]


def test_test_nerf_store_n_test_visu(tmp_path):
    """store_n.test drives gt/nerf_image/pred_nerf/target/detectron dumps
    from the NeRF test pass (ref test_step visu :654-660)."""
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.train.joint_loop import test_nerf
    from ucsa_neural_rendering_tpu.viz import Visualizer

    H, W, C = 8, 10, 40

    class FakeTrainer:
        def render_frames(self, params, poses, intr, occ, group=4,
                          which="test"):
            g = poses.shape[0]
            return {"nerf_rgb": jnp.zeros((g, H, W, 3)),
                    "nerf_semantics": jnp.zeros((g, H, W), jnp.int32),
                    "nerf_depth": jnp.ones((g, H, W))}

    class FakeDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"img": np.zeros((H, W, 3), np.float32),
                    "label": np.zeros((H, W), np.int64),
                    "pose": np.eye(4, dtype=np.float32),
                    "intrinsics": np.array([1.0, 1.0, W / 2, H / 2],
                                           np.float32)}

    visu = Visualizer(str(tmp_path), store=True)
    test_nerf(FakeTrainer(), (None,), FakeDS(), C, None, "test",
              visualizer=visu, visu_n=2)
    files = os.listdir(str(tmp_path / "test_vis")) \
        if (tmp_path / "test_vis").exists() else os.listdir(str(tmp_path))
    names = " ".join(files)
    for stem in ("gt_image_0", "nerf_image_0", "pred_nerf_0", "target_0",
                 "detectron_0", "gt_image_1"):
        assert stem in names, (stem, files)
    assert "gt_image_2" not in names  # capped at visu_n


@pytest.mark.slow
def test_pretrain_check_val_cadence(tmp_path):
    """check_val_every_n_epoch=2 → val metrics logged only every 2nd epoch
    (the reference's Trainer(**exp['trainer']) behavior)."""
    import argparse
    import json

    from ucsa_neural_rendering_tpu.data import create_split, save_split
    from ucsa_neural_rendering_tpu.data.synthetic import \
        write_synthetic_25k_dir
    from ucsa_neural_rendering_tpu.train import pretrain_loop
    from test_joint_e2e import TinySeg

    frames = str(tmp_path / "frames25k")
    os.makedirs(frames)
    write_synthetic_25k_dir(frames, n_scenes=1, n_frames_per_scene=4,
                            H=24, W=32)
    split = create_split(frames, val_ratio=0.25, seed=0)
    save_split(split, os.path.join(frames, "split.npz"))
    env = {"results": str(tmp_path / "exp"), "scannet": "",
           "scannet_frames_25k": frames}
    exp = {"general": {"name": "cv2e", "clean_up_folder_if_exists": True},
           "model": {"num_classes": 40},
           "lr_scheduler": {"active": False},
           "optimizer": {"lr": 1e-3, "name": "Adam"},
           "trainer": {"max_epochs": 2, "resume_from_checkpoint": False,
                       "check_val_every_n_epoch": 2},
           "data_module": {"batch_size": 3, "shuffle": True,
                           "drop_last": False, "root": frames,
                           "data_preprocessing": {"split_file":
                                                  "split.npz"}},
           "output_size": (24, 32)}
    pretrain_loop.train(exp, env, argparse.Namespace(seed=0,
                                                     project_name="t"),
                        model=TinySeg())
    val_steps = []
    with open(os.path.join(env["results"], "cv2e", "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "val/mean_IoU" in d:
                val_steps.append(d.get("step"))
    assert val_steps == [1]  # only epoch index 1 (2nd epoch) ran val


def test_nerf_model_from_exp_plumbing():
    """The `nerf:` YAML block fully parameterizes the SemanticNeRF — every
    documented opt-in (encoding geometry, stochastic_fwd) reaches the model,
    and a typo'd stochastic_fwd fails loudly instead of silently training a
    different estimator."""
    from ucsa_neural_rendering_tpu.train.joint_loop import nerf_model_from_exp

    exp = {"nerf": {"bound": 2.0, "n_levels": 4, "n_features": 8,
                    "log2_hashmap_size": 15,
                    "stochastic_table_grad": False,
                    "stochastic_fwd": "face"}}
    m = nerf_model_from_exp(exp, num_classes=13)
    assert (m.bound, m.n_levels, m.n_features) == (2.0, 4, 8)
    assert m.log2_hashmap_size == 15
    assert m.stochastic_table_grad is False
    assert m.stochastic_fwd == "face"
    assert m.num_semantic_classes == 13

    # defaults follow the SHIPPED configuration (config/shipped.py — the
    # quality gate's promotion target), so an exp without explicit nerf
    # keys trains the program bench.py measures; table size stays the
    # reference's 2^19 (network_tcnn_semantics.py:36-46)
    from ucsa_neural_rendering_tpu.config import (SHIPPED_NERF_ENC,
                                                  SHIPPED_NERF_SFWD)
    d = nerf_model_from_exp({}, num_classes=40)
    assert (d.n_levels, d.n_features) == SHIPPED_NERF_ENC
    assert d.log2_hashmap_size == 19
    assert d.stochastic_fwd == SHIPPED_NERF_SFWD

    with pytest.raises(ValueError, match="stochastic_fwd"):
        nerf_model_from_exp({"nerf": {"stochastic_fwd": "fase"}}, 40)


def test_shipped_yaml_blocks_match_shipped_py():
    """The promoted defaults cannot drift apart across surfaces
    (scripts/promote_shipped.py flips them together): every joint-entry
    exp YAML's renderer/nerf blocks must resolve to exactly the
    config/shipped.py values — budget, placement mode, and encoding.
    This is the drift that silently de-promoted bench_pipeline once
    (renderer block without proposal_placement)."""
    from ucsa_neural_rendering_tpu.config import (SHIPPED_NERF_ENC,
                                                  SHIPPED_NERF_SFWD,
                                                  SHIPPED_PROPOSAL,
                                                  SHIPPED_TRAIN_BUDGET)
    from ucsa_neural_rendering_tpu.train.joint_loop import (
        nerf_model_from_exp, render_cfgs_from_exp)

    checked = 0
    for rel, path, entry in _shipped_cfgs():
        if entry != "joint":
            continue
        exp = yaml.safe_load(open(path))
        rc, _, _ = render_cfgs_from_exp(exp)
        assert (rc.num_steps, rc.upsample_steps) == SHIPPED_TRAIN_BUDGET, rel
        assert rc.proposal_placement == SHIPPED_PROPOSAL, rel
        m = nerf_model_from_exp(exp, num_classes=40)
        assert (m.n_levels, m.n_features) == SHIPPED_NERF_ENC, rel
        assert m.stochastic_fwd == SHIPPED_NERF_SFWD, rel
        checked += 1
    assert checked >= 12  # 10 one_step_joint + 2 multi_step
