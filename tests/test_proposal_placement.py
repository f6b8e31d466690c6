"""Proposal placement (VERDICT r4 #4): the occupancy grid's EMA density as
a zero-hash-row proposal field — the whole sample budget placed in one
inverse-CDF draw, one full-model pass (ops/renderer.py proposal_placement).
Reference analog: the density-grid skip in the reference's (dead) CUDA
marcher, nr4seg/nerf/raymarching/src/raymarching.cu:138-307.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.data import get_rays
from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.ops.occupancy import (OccupancyConfig,
                                                     density_at, init_grid)
from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                    render_rays)
from ucsa_neural_rendering_tpu.train import NeRFTrainer

H, W = 24, 32


def tiny_model(**kw):
    return SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=4,
                        log2_hashmap_size=10, **kw)


def test_density_at_nearest_cell():
    grid = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(7.0)
    # cell [4,4,4] of an 8^3 grid over [-1,1]^3 spans [0, 0.25)^3
    inside = jnp.array([[0.1, 0.1, 0.1]])
    outside = jnp.array([[-0.1, 0.1, 0.1]])
    assert float(density_at(grid, inside, 1.0)[0]) == 7.0
    assert float(density_at(grid, outside, 1.0)[0]) == 0.0


def _proposal_z_vals(grid, n_total=16, n_rays=64):
    """Place a budget through the real render path and return depth stats
    by rendering DEPTH against a constant-density stand-in? Too indirect —
    instead replicate the placement math via the public pieces."""
    from ucsa_neural_rendering_tpu.ops.sampling import (sample_pdf,
                                                        stratified_samples)
    nears = jnp.full((n_rays,), 0.2)
    fars = jnp.full((n_rays,), 2.0)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -0.9]]), (n_rays, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_rays, 1))
    cand_z = stratified_samples(nears, fars, 128, None)
    cand_xyz = rays_o[:, None, :] + rays_d[:, None, :] * cand_z[..., None]
    sigma_c = density_at(grid, cand_xyz, 1.0)
    dz = ((fars - nears) / 128)[:, None]
    alpha = 1.0 - jnp.exp(-sigma_c * dz)
    w = jnp.maximum(alpha, 0.01)
    z_mid = 0.5 * (cand_z[..., 1:] + cand_z[..., :-1])
    return sample_pdf(z_mid, w[..., 1:-1], n_total, jax.random.key(0))


def test_placement_concentrates_in_occupied_slab():
    """A converged grid (one occupied z-slab) pulls nearly the whole budget
    into the slab; the warmup all-ones grid places ~uniformly."""
    r = 32
    grid = jnp.zeros((r, r, r))
    # occupy z in [0.25, 0.5) -> cells 20..23 along the last axis
    grid = grid.at[:, :, 20:24].set(50.0)
    z = np.asarray(_proposal_z_vals(grid))
    # ray origin z=-0.9 -> slab at depth [1.15, 1.4)
    frac_in = ((z >= 1.1) & (z <= 1.45)).mean()
    assert frac_in > 0.8, f"only {frac_in:.2f} of samples in occupied slab"

    z_warm = np.asarray(_proposal_z_vals(init_grid(OccupancyConfig(
        resolution=r))))
    # warmup: uniform over [0.2, 2.0] -> quartiles near 0.65/1.1/1.55
    q = np.quantile(z_warm, [0.25, 0.5, 0.75])
    assert np.all(np.abs(q - np.array([0.65, 1.1, 1.55])) < 0.15), q


def test_render_rays_proposal_finite_and_shaped():
    model = tiny_model()
    frames, intr = make_synthetic_scene(1, H, W)
    rays = get_rays(jnp.asarray(frames[0]["pose"]), jnp.asarray(intr), H, W)
    o = rays["rays_o"].reshape(-1, 3)[:128]
    d = rays["rays_d"].reshape(-1, 3)[:128]
    nrm = rays["direction_norms"].reshape(-1)[:128]
    variables = model.init(jax.random.key(0), jnp.zeros((8, 3)),
                           jnp.zeros((8, 3)))
    cfg = RenderConfig(num_steps=16, upsample_steps=0,
                       proposal_placement=True, max_ray_batch=128,
                       train_packed_max_entries=0)
    grid = init_grid(OccupancyConfig(resolution=16))
    out = render_rays(model, variables, o, d, nrm, jax.random.key(1), cfg,
                      occ_grid=grid)
    assert out["image"].shape == (128, 3)
    assert out["semantics"].shape[0] == 128
    for v in out.values():
        assert bool(jnp.isfinite(v).all())
    # no grid -> the flag is ignored (standard path), still finite
    out2 = render_rays(model, variables, o, d, nrm, jax.random.key(1), cfg,
                       occ_grid=None)
    assert bool(jnp.isfinite(out2["image"]).all())


def test_proposal_fit_quality():
    """End-to-end: a proposal-placement fit at 18 placed + 6 fine samples
    (the arm's 3:1 split, 24 total vs the paired occupancy test's 16+16)
    reaches the same quality band as test_occupancy_guided_fit_quality —
    identical scene/model/steps/thresholds, only the placement differs.
    Proposal-ONLY (no fine pass) measurably loses label sharpness; the
    3:1 split is the shipped arm shape (scripts/exp_synthetic_cl.py)."""
    frames, intr = make_synthetic_scene(4, H, W)
    model = SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=6,
                         log2_hashmap_size=14)
    cfg = RenderConfig(num_steps=18, upsample_steps=6,
                       proposal_placement=True, max_ray_batch=H * W,
                       occ_candidates=48, train_packed_max_entries=0)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=256, image_hw=(H, W))
    tr.occ_cfg = OccupancyConfig(resolution=32, update_every=10)
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()
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
        params, opt_state, parts = tr.train_step(params, opt_state, batch,
                                                 k, occ_grid=grid)
        if (step + 1) % tr.occ_cfg.update_every == 0:
            key, k = jax.random.split(key)
            grid = tr.update_occupancy(params, grid, k)
    assert bool(jnp.isfinite(parts["loss_nerf_total"]))
    fr = frames[0]
    rays = get_rays(jnp.asarray(fr["pose"]), jnp.asarray(intr), H, W)
    out = tr.render_image(params, jnp.asarray(fr["pose"]),
                          jnp.asarray(intr), rays, occ_grid=grid)
    pred = np.clip(np.asarray(out["nerf_rgb"]), 0, 1)
    psnr = -10 * np.log10(float(((pred - fr["image"]) ** 2).mean()))
    acc = float((np.asarray(out["nerf_semantics"]) == fr["label"]).mean())
    print(f"proposal 18+6: PSNR {psnr:.2f} acc {acc:.3f}")
    assert psnr > 12.0, f"PSNR {psnr:.2f}"
    assert acc > 0.5, f"semantic acc {acc:.3f}"


def test_joint_trainer_derived_cfgs_keep_standard_render():
    """Training with proposal placement must NOT silently change the
    test/predict render program: derived cfgs drop the proposal flag AND
    scale from the symmetric TOTAL-equivalent budget (24+8 train ->
    32+32 test -> 16+16 predict), so the train-side budget shrink never
    leaks into the full-frame label dumps that replay stability rides
    on. Explicit test_*/predict_* keys can still opt in to anything."""
    from ucsa_neural_rendering_tpu.train.joint_trainer import JointTrainer
    cfg = RenderConfig(num_steps=24, upsample_steps=8,
                       proposal_placement=True, max_ray_batch=H * W)
    tr = JointTrainer({"optimizer": {"lr_seg": 1e-4, "lr_nerf": 1e-2,
                                     "name": "Adam"}},
                      image_hw=(H, W), num_classes=6, render_cfg=cfg,
                      n_rays=64, nerf_model=tiny_model())
    assert tr.cfg.proposal_placement
    assert not tr.test_cfg.proposal_placement
    assert not tr.predict_cfg.proposal_placement
    # symmetric TOTAL-equivalent derivation: exactly the programs a
    # 32+32 incumbent training derives
    assert (tr.test_cfg.num_steps, tr.test_cfg.upsample_steps) == (32, 32)
    assert tr.test_cfg.early_stop and tr.test_cfg.stage1_steps == 16
    assert (tr.predict_cfg.num_steps,
            tr.predict_cfg.upsample_steps) == (16, 16)
    assert tr.predict_cfg.stage1_steps == 8

    # the incumbent's own derivation is unchanged
    inc = JointTrainer({"optimizer": {"lr_seg": 1e-4, "lr_nerf": 1e-2,
                                      "name": "Adam"}},
                       image_hw=(H, W), num_classes=6,
                       render_cfg=RenderConfig(num_steps=32,
                                               upsample_steps=32,
                                               max_ray_batch=H * W),
                       n_rays=64, nerf_model=tiny_model())
    assert (inc.test_cfg.num_steps, inc.test_cfg.upsample_steps) == (32, 32)
    assert (inc.predict_cfg.num_steps,
            inc.predict_cfg.upsample_steps) == (16, 16)
