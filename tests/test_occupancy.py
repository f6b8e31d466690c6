"""Occupancy-grid sampler tests: grid updates, lookup, and a guided fit on
the synthetic scene reaching dense-sampling quality with fewer samples."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.ops.occupancy import (OccupancyConfig,
                                                     init_grid,
                                                     occupancy_at,
                                                     update_grid)


def test_update_and_lookup_roundtrip():
    cfg = OccupancyConfig(resolution=16, decay=0.5)
    grid = jnp.zeros((16, 16, 16))

    # density: occupied only where x > 0
    def density_fn(pts):
        return jnp.where(pts[..., 0] > 0, 10.0, 0.0)

    grid = update_grid(grid, density_fn, bound=1.0, key=jax.random.key(0),
                       cfg=cfg, chunk=1024)
    # lookup inside occupied half → weight 1; empty half → floor
    occ_pos = occupancy_at(grid, jnp.array([[0.5, 0.0, 0.0]]), 1.0,
                           floor=0.01, density_threshold=0.01)
    occ_neg = occupancy_at(grid, jnp.array([[-0.5, 0.0, 0.0]]), 1.0,
                           floor=0.01, density_threshold=0.01)
    assert float(occ_pos[0]) == 1.0
    assert abs(float(occ_neg[0]) - 0.01) < 1e-6


def test_grid_decay():
    cfg = OccupancyConfig(resolution=8, decay=0.5)
    grid = jnp.full((8, 8, 8), 1.0)
    zero_density = lambda pts: jnp.zeros(pts.shape[:-1])
    grid = update_grid(grid, zero_density, 1.0, jax.random.key(0), cfg,
                       chunk=128)
    np.testing.assert_allclose(np.asarray(grid), 0.5)


def test_update_grid_non_power_of_two_resolution():
    cfg = OccupancyConfig(resolution=10, decay=0.5)
    grid = jnp.zeros((10, 10, 10))
    density_fn = lambda pts: jnp.ones(pts.shape[:-1])
    out = update_grid(grid, density_fn, 1.0, jax.random.key(0), cfg,
                      chunk=256)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_init_grid_optimistic():
    g = init_grid(OccupancyConfig(resolution=8))
    assert float(g.min()) == 1.0


@pytest.mark.slow
def test_occupancy_guided_fit_quality():
    """Fit the cube room with occupancy guidance at 16+16 samples/ray and
    verify the render quality stays usable (the room walls are at the volume
    boundary, so occupancy prunes the empty interior)."""
    from ucsa_neural_rendering_tpu.data import get_rays
    from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = 24, 32
    frames, intr = make_synthetic_scene(4, H, W)
    model = SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=6,
                         log2_hashmap_size=14)
    cfg = RenderConfig(num_steps=16, upsample_steps=16, occ_candidates=48,
                       max_ray_batch=H * W)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=256, image_hw=(H, W))
    tr.occ_cfg = OccupancyConfig(resolution=32, update_every=10)
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()
    assert grid.shape == (32, 32, 32)

    key = jax.random.key(1)
    for step in range(120):
        fr = frames[step % len(frames)]
        batch = {"pose": jnp.asarray(fr["pose"]),
                 "intrinsics": jnp.asarray(intr),
                 "image": jnp.asarray(fr["image"]),
                 "label": jnp.asarray(fr["label"]),
                 "depth": jnp.asarray(fr["depth"]),
                 "one_m_to_scene_uom": jnp.float32(1.0)}
        key, k = jax.random.split(key)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        if (step + 1) % tr.occ_cfg.update_every == 0:
            key, k = jax.random.split(key)
            grid = tr.update_occupancy(params, grid, k)

    assert np.isfinite(float(parts["loss_nerf_total"]))
    fr = frames[0]
    rays = get_rays(jnp.asarray(fr["pose"]), jnp.asarray(intr), H, W)
    out = tr.render_image(params, jnp.asarray(fr["pose"]), jnp.asarray(intr),
                          rays, occ_grid=grid)
    mse = float(((np.asarray(out["nerf_rgb"]) - fr["image"]) ** 2).mean())
    psnr = -10 * np.log10(mse)
    acc = float((np.asarray(out["nerf_semantics"]) == fr["label"]).mean())
    print(f"occ-guided: PSNR {psnr:.2f} acc {acc:.3f}")
    assert psnr > 12.0
    assert acc > 0.5
