"""Kill-mid-stage / resume tests for the joint loop and the multi-step
driver: per-epoch `last_ckpt` + `trainer.resume_from_checkpoint`
(ref: the Lightning ModelCheckpoint(save_last=True) + resume wiring at
scripts/train_joint.py:90-109, scripts/train_finetune.py:62-91 — the
reference writes a full resume anchor every epoch in all entry points)."""

import argparse
import os

import jax
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.train import cl_driver, joint_loop

from test_joint_e2e import (RENDER_CFG, fixture_env, make_exp,  # noqa: F401
                            small_trainer_kwargs)


class _KillAfterSaves:
    """Stand-in for joint_loop._save_stage_state that simulates a hard kill
    immediately after the n-th per-epoch checkpoint write."""

    def __init__(self, n):
        self.n = n
        self.calls = 0
        self.real = joint_loop._save_stage_state

    def __call__(self, *args):
        self.real(*args)
        self.calls += 1
        if self.calls >= self.n:
            raise KeyboardInterrupt("simulated kill")


def _joint_args(exp_name):
    return argparse.Namespace(exp_name=exp_name, seed=0, fix_nerf=False,
                              nerf_train_epoch=2, joint_train_epoch=2,
                              project_name="t")


def _run_joint(fixture_env, run_name, resume):
    exp = make_exp()
    exp["general"]["name"] = run_name
    exp["trainer"]["resume_from_checkpoint"] = resume
    return joint_loop.train(exp, fixture_env, _joint_args("resume_e2e"),
                            render_cfg=RENDER_CFG,
                            val_scene_list=["scene0000_00"],
                            trainer_kwargs=small_trainer_kwargs())


def _assert_trees_equal(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a, b)


@pytest.mark.slow
def test_joint_kill_resume_bitmatches_uninterrupted(fixture_env,
                                                    monkeypatch):
    """A joint stage killed mid-stage and resumed must land on bit-identical
    final states (NeRF params + Adam moments, seg params + BN stats + Adam
    moments) to an uninterrupted run — exercises the occupancy grid, the
    threaded PRNG key, and the epoch-pinned loader streams through the
    checkpoint."""
    ref_nerf, ref_seg = _run_joint(fixture_env, "resume_ref", resume=False)

    # killed run: dies right after the 2nd per-epoch save (= both NeRF
    # epochs done, no joint epoch yet — the phase boundary, the spot the
    # round-3 verdict called out as losing the whole stage)
    killer = _KillAfterSaves(2)
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer)
    with pytest.raises(KeyboardInterrupt):
        _run_joint(fixture_env, "resume_kill", resume=False)
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer.real)
    assert os.path.isdir(os.path.join(fixture_env["results"], "resume_kill",
                                      "last_ckpt"))

    # resumed run: clean_up_folder_if_exists stays True in make_exp — a
    # resuming run must keep the folder (and its last_ckpt) anyway
    res_nerf, res_seg = _run_joint(fixture_env, "resume_kill", resume=True)

    _assert_trees_equal(ref_nerf, res_nerf)
    _assert_trees_equal(ref_seg, res_seg)


@pytest.mark.slow
def test_joint_kill_resume_mid_joint_phase(fixture_env, monkeypatch):
    """Same, killed after the 3rd save (one joint epoch done) — resumes into
    the middle of phase 2 with the seg optimizer mid-flight."""
    ref_nerf, ref_seg = _run_joint(fixture_env, "resume_ref2", resume=False)

    killer = _KillAfterSaves(3)
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer)
    with pytest.raises(KeyboardInterrupt):
        _run_joint(fixture_env, "resume_kill2", resume=False)
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer.real)

    res_nerf, res_seg = _run_joint(fixture_env, "resume_kill2", resume=True)
    _assert_trees_equal(ref_nerf, res_nerf)
    _assert_trees_equal(ref_seg, res_seg)


@pytest.mark.slow
def test_cl_driver_protocol_resume(fixture_env, monkeypatch):
    """A killed multi-step run restarted with resume_from_checkpoint skips
    completed stages (final deeplab_ckpt on disk) and resumes the in-flight
    one from its last_ckpt instead of redoing the whole protocol."""
    exp = make_exp()
    exp["cl"] = {"active": False, "use_novel_viewpoints": False,
                 "replay_buffer_size": 4}
    exp["general"]["checkpoint_load"] = None
    exp["trainer"]["load_from_checkpoint"] = False
    args = argparse.Namespace(exp_name="resume_cl", seed=0, fix_nerf=False,
                              nerf_train_epoch=1, joint_train_epoch=1,
                              project_name="t")
    order = ["scene0000_00", "scene0001_00"]

    # kill during stage 1 (stage 0 completes: 2 epochs = 2 saves; die on
    # the first save of stage 1)
    killer = _KillAfterSaves(3)
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer)
    with pytest.raises(KeyboardInterrupt):
        cl_driver.main(exp, fixture_env, args, scene_order=order,
                       render_cfg=RENDER_CFG,
                       val_scene_list=["scene0000_00"],
                       trainer_kwargs=small_trainer_kwargs())
    monkeypatch.setattr(joint_loop, "_save_stage_state", killer.real)
    assert os.path.isdir(os.path.join(fixture_env["results"], "resume_cl",
                                      "stage_0", "deeplab_ckpt"))
    assert not os.path.isdir(os.path.join(fixture_env["results"],
                                          "resume_cl", "stage_1",
                                          "deeplab_ckpt"))

    exp2 = make_exp()
    exp2["cl"] = {"active": False, "use_novel_viewpoints": False,
                  "replay_buffer_size": 4}
    exp2["general"]["checkpoint_load"] = None
    exp2["trainer"]["load_from_checkpoint"] = False
    exp2["trainer"]["resume_from_checkpoint"] = True
    results = cl_driver.main(exp2, fixture_env, args, scene_order=order,
                             render_cfg=RENDER_CFG,
                             val_scene_list=["scene0000_00"],
                             trainer_kwargs=small_trainer_kwargs())
    assert results[0] is None  # stage 0 was skipped, not re-trained
    assert results[1] is not None
    for stage in ("stage_0", "stage_1"):
        assert os.path.isdir(os.path.join(fixture_env["results"],
                                          "resume_cl", stage,
                                          "deeplab_ckpt"))


def test_save_last_opt_out(fixture_env):
    """trainer.save_last: false disables the per-epoch writes (the TPU
    extension knob; default matches the reference's save_last=True)."""
    exp = make_exp()
    exp["general"]["name"] = "resume_nolast"
    exp["trainer"]["save_last"] = False
    args = argparse.Namespace(exp_name="resume_e2e_nolast", seed=0,
                              fix_nerf=False, nerf_train_epoch=1,
                              joint_train_epoch=0, project_name="t")
    joint_loop.train(exp, fixture_env, args, render_cfg=RENDER_CFG,
                     val_scene_list=["scene0000_00"],
                     trainer_kwargs=small_trainer_kwargs())
    assert not os.path.exists(os.path.join(fixture_env["results"],
                                           "resume_nolast", "last_ckpt"))
