"""End-to-end joint-training stage on the synthetic fixture: NeRF fit →
joint steps → predict dumps → checkpoint chaining (multi-step driver)."""

import argparse
import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ucsa_neural_rendering_tpu.data.synthetic import write_synthetic_scene_dir
from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
from ucsa_neural_rendering_tpu.train import cl_driver, joint_loop

H, W = 24, 32
NUM_CLASSES = 40


class TinySeg(nn.Module):
    """Small stand-in for DeepLabV3 with the same interface (out dict, BN
    batch_stats, use_running_average/deterministic flags)."""
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x, use_running_average=True, deterministic=True):
        h = nn.Conv(16, (3, 3), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=use_running_average,
                         momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Conv(self.num_classes, (1, 1))(h)
        return {"out": h}


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cl_env")
    scannet = str(root / "scans")
    for scene in ("scene0000_00", "scene0001_00"):
        write_synthetic_scene_dir(scannet, scene, n_frames=5, H=H, W=W)
    env = {"results": str(root / "experiments"), "scannet": scannet,
           "scannet_frames_25k": str(root / "frames25k")}
    os.makedirs(env["scannet_frames_25k"], exist_ok=True)
    return env


def make_exp():
    return {
        "general": {"name": "joint_test", "clean_up_folder_if_exists": True,
                    "checkpoint_load": None},
        "model": {"num_classes": NUM_CLASSES},
        "lr_scheduler": {"active": False},
        "optimizer": {"lr_seg": 1e-4, "lr_nerf": 1e-2, "name": "Adam"},
        "trainer": {"max_epochs": 1, "resume_from_checkpoint": False,
                    "load_from_checkpoint": False},
        "data_module": {"batch_size": 2, "shuffle": True, "num_workers": 0,
                        "drop_last": True,
                        "data_preprocessing": {"split_file": "split.npz",
                                               "split_file_cl":
                                                   "split_cl.npz"}},
        "visualizer": {"store": False, "store_n": {"train": 0, "val": 0,
                                                   "test": 0}},
        "scenes": ["scene0000_00"],
        "cl": {"active": False, "use_novel_viewpoints": False,
               "replay_buffer_size": 0},
        "output_size": (H, W),
    }


def small_trainer_kwargs():
    return {
        "nerf_model": SemanticNeRF(bound=1.0,
                                   num_semantic_classes=NUM_CLASSES,
                                   n_levels=4, log2_hashmap_size=12),
        "seg_model": TinySeg(),
        "n_rays": 256,
    }


RENDER_CFG = RenderConfig(num_steps=24, upsample_steps=24, max_ray_batch=H * W)


@pytest.mark.slow
def test_joint_stage_end_to_end(fixture_env):
    exp = make_exp()
    args = argparse.Namespace(exp_name="e2e_joint", seed=0, fix_nerf=False,
                              nerf_train_epoch=1, joint_train_epoch=1,
                              project_name="t")
    nerf_state, seg_state = joint_loop.train(
        exp, fixture_env, args, render_cfg=RENDER_CFG,
        val_scene_list=["scene0000_00"],
        trainer_kwargs=small_trainer_kwargs())

    model_path = os.path.join(fixture_env["results"], "joint_test")
    assert os.path.isdir(os.path.join(model_path, "deeplab_ckpt"))
    # predict dumps for the scene (4 train frames → 4 PNGs per folder)
    scene_exp = os.path.join(fixture_env["scannet"], "scene0000_00",
                             "e2e_joint")
    for sub in ("nerf_image", "nerf_label", "seg_label"):
        files = os.listdir(os.path.join(scene_exp, sub))
        assert len(files) == 5  # predict mode uses all frames
    # rendered labels must be in 1..40 storage convention
    import cv2
    lab = cv2.imread(os.path.join(scene_exp, "nerf_label",
                                  sorted(os.listdir(os.path.join(
                                      scene_exp, "nerf_label")))[0]),
                     cv2.IMREAD_UNCHANGED)
    assert lab.min() >= 1 and lab.max() <= NUM_CLASSES


@pytest.mark.slow
def test_multi_step_driver_chains_checkpoints(fixture_env):
    exp = make_exp()
    exp["cl"] = {"active": False, "use_novel_viewpoints": False,
                 "replay_buffer_size": 4}
    args = argparse.Namespace(exp_name="e2e_cl", seed=0, fix_nerf=False,
                              nerf_train_epoch=1, joint_train_epoch=1,
                              project_name="t")
    # stage 0 loads nothing (no pretrained ckpt in fixture)
    exp["general"]["checkpoint_load"] = None
    exp["trainer"]["load_from_checkpoint"] = False

    results = cl_driver.main(
        exp, fixture_env, args, scene_order=["scene0000_00", "scene0001_00"],
        render_cfg=RENDER_CFG, val_scene_list=["scene0000_00"],
        trainer_kwargs=small_trainer_kwargs())
    assert len(results) == 2
    for stage in ("stage_0", "stage_1"):
        assert os.path.isdir(os.path.join(fixture_env["results"], "e2e_cl",
                                          stage, "deeplab_ckpt"))
    # stage_1 consumed stage_0's checkpoint (load_from_checkpoint was set)
    assert exp["general"]["checkpoint_load"].endswith(
        os.path.join("stage_0", "deeplab_ckpt"))


def test_joint_step_logs_mean_nerf_loss_over_images(fixture_env):
    """The per-image NeRF losses in joint_step must be averaged over the
    batch's images, not overwritten by the last image (the reference logs
    each image's loss; the epoch mean of per-image means is equivalent).
    The scanned batch update must also match B sequential per-image Adam
    steps bit-for-bit (it IS the reference loop, minus host roundtrips).
    The stub-based log check drives the UNFUSED joint_step (the fused
    single-dispatch default is covered by test_dispatch_coalescing.py's
    equivalence tests; stubbing Python methods can't observe a fused
    program)."""
    import jax

    exp = make_exp()
    exp.setdefault("nerf", {})["fused_joint_step"] = False
    trainer = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                      num_classes=NUM_CLASSES,
                                      render_cfg=RENDER_CFG,
                                      **small_trainer_kwargs())
    b = 2
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, NUM_CLASSES, (b, H, W)).astype(
        np.int32))
    depths = jnp.asarray(np.full((b, H, W), 0.8, np.float32))
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
    intrs = jnp.asarray(np.tile(np.array([20.0, 20.0, W / 2, H / 2],
                                         np.float32), (b, 1)))
    uoms = jnp.ones(b, jnp.float32)
    keys = jax.random.split(jax.random.key(5), b)

    # sequential per-image updates (the reference's literal loop)
    state = trainer.init_nerf(jax.random.key(0))
    parts_seq = []
    for i in range(b):
        state, parts = trainer._nerf_update_image(
            state, imgs[i], labels[i], depths[i], poses[i], intrs[i],
            uoms[i], keys[i], None)
        parts_seq.append(parts)

    # one scanned dispatch from the same init
    state2 = trainer.init_nerf(jax.random.key(0))
    state2, parts_mean = trainer._nerf_update_batch(
        state2, imgs, labels, depths, poses, intrs, uoms, keys, None)

    jax.tree.map(lambda a, c: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(c)), state[0], state2[0])
    for k2 in parts_mean:
        want = np.mean([float(p[k2]) for p in parts_seq])
        assert abs(float(parts_mean[k2]) - want) < 1e-6

    # joint_step propagates the image-mean parts into its logs
    rendered = {"nerf_rgb": jnp.zeros((b, H, W, 3)),
                "nerf_semantics": jnp.zeros((b, H, W), jnp.int32)}
    trainer.render_frames = lambda *a, **kw: rendered
    trainer.seg_infer = lambda seg_state, im, update_bn=False: (
        jnp.zeros((b, H, W), jnp.int32), None, seg_state)
    trainer._nerf_update_all = lambda st, *a: (
        st, {"loss_nerf_total": jnp.float32(2.0)})
    trainer._augment_rendered = lambda k, rgbs, lab: (rgbs, lab)
    trainer._seg_update = lambda s, i, l, k: (s, jnp.float32(0.0))
    batch_new = {"img": np.zeros((b, H, W, 3), np.float32),
                 "depth": np.ones((b, H, W), np.float32),
                 "pose": np.asarray(poses), "intrinsics": np.asarray(intrs),
                 "one_m_to_scene_uom": np.ones(b, np.float32)}
    _, _, logs = trainer.joint_step(
        ("p", "o"), ("sp", "sb", "so"), None, batch_new, None,
        jax.random.key(0))
    assert abs(float(logs["loss_nerf_total"]) - 2.0) < 1e-6


def test_predict_render_cfg_plumbing(fixture_env):
    """A distinct `predict_render_cfg` drives ONLY the predict-phase
    renders (run_predict / predict_frame); test metrics and in-training
    renders keep test_cfg. Without one, predict shares the test program
    (no duplicate compile)."""
    import jax
    from dataclasses import replace

    exp = make_exp()
    # occupancy-mode default: predict runs the derived fast budget
    # (quarter-budget stage 1, half-budget refine, k/8) — the measured
    # knob from PERFORMANCE.md round 3
    tr = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                 num_classes=NUM_CLASSES,
                                 render_cfg=RENDER_CFG,
                                 **small_trainer_kwargs())
    assert tr.predict_cfg.early_stop
    assert tr.predict_cfg.stage1_steps == RENDER_CFG.num_steps // 4
    assert tr.predict_cfg.num_steps == RENDER_CFG.num_steps // 2
    assert tr.predict_cfg.refine_fraction == 0.125
    assert tr._render_frames_predict_jit is not tr._render_frames_jit

    # dense reference-parity mode: predict == test == train (one program)
    exp_dense = make_exp()
    exp_dense["nerf"] = {"use_occupancy": False}
    trd = joint_loop.JointTrainer(exp_dense, image_hw=(H, W),
                                  num_classes=NUM_CLASSES,
                                  render_cfg=RENDER_CFG,
                                  **small_trainer_kwargs())
    assert trd.predict_cfg == trd.test_cfg == RENDER_CFG
    assert trd._render_frames_predict_jit is trd._render_frames_jit

    # an explicit test config is authoritative for predict too
    tre = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                  num_classes=NUM_CLASSES,
                                  render_cfg=RENDER_CFG,
                                  test_render_cfg=RENDER_CFG,
                                  **small_trainer_kwargs())
    assert tre.predict_cfg == tre.test_cfg == RENDER_CFG
    assert tre._render_frames_predict_jit is tre._render_frames_jit

    # distinct predict config: cheaper budget, separate program
    pc = replace(RENDER_CFG, num_steps=8, upsample_steps=8)
    tr2 = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                  num_classes=NUM_CLASSES,
                                  render_cfg=RENDER_CFG,
                                  predict_render_cfg=pc,
                                  **small_trainer_kwargs())
    # test_cfg keeps its derived early-stop default (same as tr's);
    # only the predict path changes
    assert tr2.predict_cfg == pc and tr2.test_cfg == tr.test_cfg
    assert tr2._render_frames_predict_jit is not tr2._render_frames_jit

    params, _ = tr2.init_nerf(jax.random.key(0))
    pose = np.eye(4, dtype=np.float32)
    intr = jnp.asarray([20.0, 20.0, W / 2, H / 2], jnp.float32)
    out_t = tr2.render_frames(params, pose[None], intr, which="test")
    out_p = tr2.render_frames(params, pose[None], intr, which="predict")
    for o in (out_t, out_p):
        assert o["nerf_rgb"].shape == (1, H, W, 3)
        assert o["nerf_semantics"].shape == (1, H, W)
        assert np.all(np.isfinite(np.asarray(o["nerf_rgb"])))
    # the 8+8 predict budget is a different program with different sample
    # placement — outputs are finite and shaped, not bit-equal; at an
    # UNTRAINED field both argmax over near-uniform semantics, so just
    # check the test-path output is unchanged by predict's existence
    tr3 = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                  num_classes=NUM_CLASSES,
                                  render_cfg=RENDER_CFG,
                                  **small_trainer_kwargs())
    params3, _ = tr3.init_nerf(jax.random.key(0))
    out_t3 = tr3.render_frames(params3, pose[None], intr, which="test")
    np.testing.assert_array_equal(np.asarray(out_t["nerf_rgb"]),
                                  np.asarray(out_t3["nerf_rgb"]))


def test_fused_image_step_matches_single_image_and_runs_batched(fixture_env):
    """nerf.fused_image_step=true takes ONE Adam step over all B images'
    rays. For B=1 it must match the per-image step given the same
    ray/render keys; for B>1 it must produce finite losses and update
    every param leaf (the numerics divergence from sequential stepping is
    deliberate and documented on _nerf_update_fused_impl).

    The equivalence half uses EXACT trilinear table grads: the stochastic
    corner estimator draws corners by comparing uniforms against computed
    weights, and the fused program's different XLA layout can flip draws at
    tie boundaries (observed only under the 8-virtual-device test mesh) —
    chaotic by construction, not a fused-step defect."""
    import jax

    exp = make_exp()
    exp["nerf"] = {"fused_image_step": True}
    kwargs = small_trainer_kwargs()
    kwargs["nerf_model"] = SemanticNeRF(
        bound=1.0, num_semantic_classes=NUM_CLASSES, n_levels=4,
        log2_hashmap_size=12, stochastic_table_grad=False)
    trainer = joint_loop.JointTrainer(exp, image_hw=(H, W),
                                      num_classes=NUM_CLASSES,
                                      render_cfg=RENDER_CFG, **kwargs)
    assert trainer.fused_image_step

    rng = np.random.default_rng(3)
    b = 2
    imgs = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, NUM_CLASSES, (b, H, W)).astype(
        np.int32))
    depths = jnp.asarray(np.full((b, H, W), 0.8, np.float32))
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
    intrs = jnp.asarray(np.tile(np.array([20.0, 20.0, W / 2, H / 2],
                                         np.float32), (b, 1)))
    uoms = jnp.ones(b, jnp.float32)

    # B=1 equivalence: fused(key) draws k_render then one sample key from
    # the remainder — replicate that split for the per-image call
    key = jax.random.key(7)
    k_rest, k_render = jax.random.split(key)
    k_sample = jax.random.split(k_rest, 1)[0]
    state = trainer.init_nerf(jax.random.key(0))
    state_f, parts_f = trainer._nerf_update_fused(
        state, imgs[:1], labels[:1], depths[:1], poses[:1], intrs[:1],
        uoms[:1], key, None)

    state2 = trainer.init_nerf(jax.random.key(0))
    # the per-image impl splits its key into (k_rays, k_render); fold the
    # fused mode's two keys into one matching pair via the impl directly
    from ucsa_neural_rendering_tpu.data.rays import get_rays_sampled
    from ucsa_neural_rendering_tpu.train.nerf_trainer import nerf_losses
    from ucsa_neural_rendering_tpu.ops.renderer import render_rays
    import optax

    def one_image_step(nerf_state):
        params, opt_state = nerf_state
        rays_o, rays_d, dnorms, inds = get_rays_sampled(
            poses[0], intrs[0], H, W, k_sample, trainer.n_rays)
        gt_rgb = imgs[0].reshape(-1, 3)[inds]
        lab = labels[0].reshape(-1)[inds]
        gt_depth = depths[0].reshape(-1)[inds]

        def loss_fn(p):
            out = render_rays(trainer.nerf_model, {"params": p}, rays_o,
                              rays_d, dnorms, k_render, trainer.cfg, None)
            return nerf_losses(out, gt_rgb, lab, gt_depth,
                               jnp.full((trainer.n_rays,), uoms[0]),
                               NUM_CLASSES)

        (_, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = trainer.nerf_tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), parts

    state_r, parts_r = jax.jit(one_image_step)(state2)
    # bit-exact on a single-device CPU backend; under the 8-virtual-device
    # test mesh XLA compiles the vmapped program differently and tiny
    # reassociation diffs (~1e-6) survive Adam. Tolerance is 0.1% of the
    # 1e-2 Adam step magnitude — far below any real divergence.
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-5), state_f[0],
        state_r[0])

    # B=2 smoke: finite parts, every leaf moved (the step donates its input
    # state — snapshot to host first)
    state3 = trainer.init_nerf(jax.random.key(0))
    before = jax.tree.map(np.asarray, state3[0])
    state4, parts = trainer._nerf_update_fused(
        state3, imgs, labels, depths, poses, intrs, uoms,
        jax.random.key(9), None)
    for v in parts.values():
        assert np.isfinite(float(v))
    moved = jax.tree.map(
        lambda a, c: bool(np.any(np.asarray(a) != np.asarray(c))),
        before, state4[0])
    assert all(jax.tree.leaves(moved))

    # nerf_fit_step routes through the fused path when the flag is set
    called = {}
    orig = trainer._nerf_update_fused

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    trainer._nerf_update_fused = spy
    batch = {"img": imgs, "depth": depths, "pose": poses,
             "intrinsics": intrs, "one_m_to_scene_uom": uoms}
    trainer.seg_infer = lambda seg_state, im, update_bn=False: (
        labels, None, seg_state)
    trainer.nerf_fit_step(state4, ("p", "b", "o"), batch, jax.random.key(1))
    assert called.get("yes")
