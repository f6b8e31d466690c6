"""Multi-device sharding tests on the virtual 8-device CPU mesh: the NeRF
train step with the ray axis sharded, and sharded-vs-single numerical
agreement of the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
from ucsa_neural_rendering_tpu.parallel import get_mesh
from ucsa_neural_rendering_tpu.train import NeRFTrainer


@pytest.mark.slow
def test_nerf_train_step_ray_sharded():
    mesh = get_mesh()
    assert mesh.devices.size == 8
    H = W = 16
    model = SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=4,
                         log2_hashmap_size=10)
    cfg = RenderConfig(num_steps=8, upsample_steps=8)

    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([12.0, 12.0, W / 2, H / 2]),
        "image": jnp.ones((H, W, 3)) * 0.25,
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W)) * 0.8,
        "one_m_to_scene_uom": jnp.float32(1.0),
    }

    tr_mesh = NeRFTrainer(model, cfg, n_rays=128, image_hw=(H, W), mesh=mesh)
    tr_single = NeRFTrainer(model, cfg, n_rays=128, image_hw=(H, W))
    p0, o0 = tr_mesh.init(jax.random.key(0))
    p1, o1 = tr_single.init(jax.random.key(0))

    key = jax.random.key(5)
    pm, om, parts_m = tr_mesh.train_step(p0, o0, batch, key)
    ps, os_, parts_s = tr_single.train_step(p1, o1, batch, key)

    # sharded and single-device steps compute the same loss (same rng path)
    assert abs(float(parts_m["loss_nerf_total"])
               - float(parts_s["loss_nerf_total"])) < 1e-4
    # params updated identically up to fp tolerance
    lm = jax.tree.leaves(pm)[0]
    ls = jax.tree.leaves(ps)[0]
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ls), atol=1e-5)

    # a second sharded step runs (state threading works under shardings)
    pm, om, parts2 = tr_mesh.train_step(pm, om, batch, jax.random.key(6))
    assert np.isfinite(float(parts2["loss_nerf_total"]))


@pytest.mark.slow
def test_joint_step_mesh_sharded_matches_single():
    """The flagship joint_step on the 8-device mesh: rays + render chunks +
    assembled seg batch sharded on `data`; numerics match the single-device
    step (same rng path), and state threads through a second step."""
    from ucsa_neural_rendering_tpu.train import JointTrainer

    mesh = get_mesh()
    H = W = 16
    n_dev = mesh.devices.size
    exp = {"optimizer": {"lr_nerf": 1e-2, "lr_seg": 1e-4, "name": "Adam"},
           "nerf": {"use_occupancy": False}}

    import flax.linen as nn

    class TinySeg(nn.Module):
        num_classes: int = 6

        @nn.compact
        def __call__(self, x, use_running_average=True, deterministic=True):
            h = nn.Conv(8, (3, 3), padding="SAME")(x)
            h = nn.BatchNorm(use_running_average=use_running_average,
                             momentum=0.9)(h)
            h = nn.relu(h)
            return {"out": nn.Conv(self.num_classes, (1, 1))(h)}

    def make(m):
        return JointTrainer(
            exp, image_hw=(H, W), num_classes=6,
            render_cfg=RenderConfig(num_steps=8, upsample_steps=8,
                                    max_ray_batch=H * W),
            n_rays=16 * n_dev,
            nerf_model=SemanticNeRF(bound=1.0, num_semantic_classes=6,
                                    n_levels=4, log2_hashmap_size=10),
            seg_model=TinySeg(), mesh=m)

    rng = np.random.default_rng(0)
    b = 2
    batch_new = {
        "img": rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32),
        "depth": np.full((b, H, W), 0.8, np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        "intrinsics": np.tile(np.array([12.0, 12.0, W / 2, H / 2],
                                       np.float32), (b, 1)),
        "one_m_to_scene_uom": np.ones(b, np.float32),
    }
    batch_old = {
        "img": rng.uniform(0, 1, (n_dev - b, H, W, 3)).astype(np.float32),
        "nerf_label": rng.integers(-1, 6, (n_dev - b, H, W)).astype(np.int32),
    }

    results = {}
    for tag, m in (("mesh", mesh), ("single", None)):
        jt = make(m)
        ns = jt.init_nerf(jax.random.key(1))
        ss = jt.init_seg(jax.random.key(2))
        ns, ss, logs = jt.joint_step(ns, ss, batch_old, batch_new, None,
                                     jax.random.key(3))
        results[tag] = (ns, logs)

    lm, ls = results["mesh"][1], results["single"][1]
    assert abs(float(lm["loss_seg"]) - float(ls["loss_seg"])) < 1e-4
    assert abs(float(lm["loss_nerf_total"])
               - float(ls["loss_nerf_total"])) < 1e-4
    a = jax.tree.leaves(results["mesh"][0][0])[0]
    bb = jax.tree.leaves(results["single"][0][0])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


@pytest.mark.slow
def test_fused_image_step_mesh_matches_single():
    """Image-parallel NeRF fitting (ARCHITECTURE.md comm model): the fused
    multi-image step with B = mesh size shards the concatenated ray axis so
    each device takes whole images; numerics match the single-device fused
    step (exact-grad model — the stochastic corner estimator is chaotic
    under layout changes, see test_joint_e2e's fused test)."""
    from ucsa_neural_rendering_tpu.train.joint_trainer import JointTrainer

    mesh = get_mesh()
    H = W = 16
    b = mesh.devices.size
    model = SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=4,
                         log2_hashmap_size=10, stochastic_table_grad=False)
    cfg = RenderConfig(num_steps=8, upsample_steps=8, max_ray_batch=H * W)
    exp = {"optimizer": {"lr_nerf": 1e-2, "lr_seg": 1e-4, "name": "Adam"},
           "nerf": {"use_occupancy": False, "fused_image_step": True}}

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32))
    labs = jnp.asarray(rng.integers(-1, 6, (b, H, W)).astype(np.int32))
    deps = jnp.asarray(np.full((b, H, W), 0.8, np.float32))
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
    intrs = jnp.asarray(np.tile(np.array([12.0, 12.0, W / 2, H / 2],
                                         np.float32), (b, 1)))
    uoms = jnp.ones(b, jnp.float32)

    outs = {}
    for name, m in (("mesh", mesh), ("single", None)):
        jt = JointTrainer(exp, image_hw=(H, W), num_classes=6,
                          render_cfg=cfg, n_rays=64, nerf_model=model,
                          seg_model=object(), mesh=m)
        state = jt.init_nerf(jax.random.key(0))
        state, parts = jt._nerf_update_fused(
            state, imgs, labs, deps, poses, intrs, uoms, jax.random.key(5),
            None)
        outs[name] = (jax.tree.map(np.asarray, state[0]),
                      float(parts["loss_nerf_total"]))

    assert abs(outs["mesh"][1] - outs["single"][1]) < 1e-4
    jax.tree.map(lambda a, c: np.testing.assert_allclose(a, c, atol=1e-5),
                 outs["mesh"][0], outs["single"][0])
