"""Non-default encoding geometry (n_levels x n_features) regression tests.

The encoding re-parameterization lever (PERFORMANCE.md round 4: gather rows
per point scale with LEVEL COUNT, row width is nearly free) makes wide-row
geometries like 4x8 / 8x4 first-class configs (`nerf.n_levels` /
`nerf.n_features`, ref tcnn surface at network_tcnn_semantics.py:36-46 fixes
16x2). These tests pin the full path — encode math, custom-VJP gradients,
trainer step, packed render tables — at F != 2 on CPU so a promoted default
can't silently regress.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.models.hash_encoding import (
    hash_encode, hash_encode_stochastic_grad, make_spec)
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
from ucsa_neural_rendering_tpu.train import NeRFTrainer


def test_wide_feature_spec_out_dim():
    for L, F in ((4, 8), (8, 4), (2, 16)):
        spec = make_spec(n_levels=L, n_features=F, log2_hashmap_size=10)
        assert spec.n_features == F
        assert spec.out_dim == 32  # constant encoding width across geometries


def test_wide_feature_interpolation_exact_on_vertices(rng):
    """Vertex collapse must hold for any row width, not just F=2."""
    spec = make_spec(n_levels=1, n_features=8, base_resolution=4,
                     per_level_scale=1.0)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 8))
                        .astype(np.float32))
    x = jnp.array([[1 / 4, 2 / 4, 3 / 4]])
    out = hash_encode(table, x, spec, compute_dtype=jnp.float32)
    stride = 5
    idx = (3 * stride + 2) * stride + 1
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(table)[idx],
                               rtol=1e-5)


def test_wide_feature_grad_matches_dense_autodiff(rng):
    """The scatter-free custom VJP must agree with plain autodiff through
    the (differentiable) interpolation at F=8."""
    spec = make_spec(n_levels=4, n_features=8, base_resolution=4,
                     per_level_scale=1.5, log2_hashmap_size=8)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 8))
                        .astype(np.float32))
    x = jnp.asarray(rng.uniform(0.05, 0.95, (64, 3)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(64, spec.out_dim)).astype(np.float32))

    def loss_vjp(t):
        return jnp.vdot(hash_encode(t, x, spec,
                                    compute_dtype=jnp.float32), cot)

    g = jax.grad(loss_vjp)(table)
    # finite-difference spot check on the 5 largest-|g| rows
    gn = np.asarray(g)
    flat = np.argsort(-np.abs(gn).max(axis=1))[:5]
    eps = 1e-3
    for r in flat:
        c = int(np.argmax(np.abs(gn[r])))
        e = np.zeros_like(gn)
        e[r, c] = eps
        fd = (float(loss_vjp(table + e)) - float(loss_vjp(table - e))) \
            / (2 * eps)
        np.testing.assert_allclose(fd, gn[r, c], rtol=5e-2, atol=1e-4)


def test_wide_feature_stochastic_grad_mass_and_correlation(rng):
    """The stochastic single-corner backward keeps its exact total-mass
    identity and strong row-level correlation at F=8 (mirrors the F=2 test
    in test_models.py on the wide-row geometry)."""
    spec = make_spec(n_levels=2, n_features=8, base_resolution=4,
                     per_level_scale=2.0, log2_hashmap_size=8)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 8))
                        .astype(np.float32)) * 0.01
    n = 20000
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec)
                                   .astype(jnp.float32)))(table)
    # trilinear weights sum to 1 per (point, level) → mass = N * L * F
    assert abs(float(jnp.sum(g)) - n * 2 * 8) < 4.0

    gs = jax.grad(lambda t: jnp.sum(hash_encode_stochastic_grad(t, x, spec)
                                    .astype(jnp.float32)))(table)
    assert abs(float(jnp.sum(gs)) - n * 2 * 8) < 4.0
    gf = np.asarray(g).ravel()
    gsr = np.asarray(gs).ravel()
    mask = np.abs(gf) > 1e-8
    corr = np.corrcoef(gf[mask], gsr[mask])[0, 1]
    assert corr > 0.9, corr


def test_trainer_step_and_packed_render_at_4x8(rng):
    """Full NeRFTrainer step + packed-table render on the 4x8 geometry —
    the exact path the promoted config runs."""
    H, W = 12, 16
    model = SemanticNeRF(bound=2.0, num_semantic_classes=5, n_levels=4,
                         n_features=8, log2_hashmap_size=12)
    cfg = RenderConfig(num_steps=8, upsample_steps=8, occ_candidates=16)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=64, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()
    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([20.0, 20.0, W / 2, H / 2]),
        "image": jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W), jnp.float32) * 2.0,
        "one_m_to_scene_uom": jnp.float32(1.0),
    }
    losses = []
    key = jax.random.key(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        losses.append(float(parts["loss_nerf_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 1.5  # moving, not exploding

    # packed render table builds + renders at F=8 (cell rows are 8-wide)
    tr.cfg = dataclasses.replace(cfg, early_stop=True, stage1_steps=4,
                                 refine_fraction=0.25)
    packed = tr.packed_for(params)
    from ucsa_neural_rendering_tpu.data.rays import get_rays
    rays = get_rays(batch["pose"], batch["intrinsics"], H, W)
    out = tr._render_image_impl(params, batch["pose"], batch["intrinsics"],
                                rays, grid, packed)
    assert np.isfinite(np.asarray(out["nerf_rgb"])).all()
    assert out["nerf_semantics"].shape == (H, W)  # argmax label map
    assert out["nerf_semantics_raw"].shape == (H, W, 5)
