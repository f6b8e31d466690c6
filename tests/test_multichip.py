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
