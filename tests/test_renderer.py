"""Renderer integration tests on the analytic cube-room scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.data import get_rays
from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                    normalize_semantics,
                                                    render_rays,
                                                    render_rays_staged)


@pytest.fixture(scope="module")
def tiny_model():
    model = SemanticNeRF(bound=1.0, num_semantic_classes=6, n_levels=4,
                         log2_hashmap_size=12)
    x = jnp.zeros((4, 3))
    d = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    variables = model.init(jax.random.key(0), x, d)
    return model, variables


def test_render_shapes_and_finiteness(tiny_model):
    model, variables = tiny_model
    cfg = RenderConfig(num_steps=16, upsample_steps=16)
    n = 32
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    dn = jnp.ones((n,))
    out = render_rays(model, variables, rays_o, rays_d, dn,
                      jax.random.key(1), cfg)
    assert out["image"].shape == (n, 3)
    assert out["semantics"].shape == (n, 6)
    assert out["depth"].shape == (n,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_render_missed_rays_finite(tiny_model):
    """Rays that miss the AABB get near == far == FLT_MAX (CUDA-kernel
    parity, ops/aabb.py): the render must stay finite — samples clip to the
    box and the degenerate output carries no NaNs/infs in rgb/semantics."""
    model, variables = tiny_model
    cfg = RenderConfig(num_steps=16, upsample_steps=16)
    n = 16
    # origins outside the box, directions pointing further away
    rays_o = jnp.tile(jnp.array([[3.0, 0.0, 0.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[1.0, 0.3, 0.0]]), (n, 1))
    dn = jnp.full((n,), float(jnp.linalg.norm(rays_d[0])))
    out = render_rays(model, variables, rays_o, rays_d, dn,
                      jax.random.key(2), cfg)
    for k in ("image", "semantics"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert not np.isnan(np.asarray(out["depth"])).any()


class _SheetModel:
    """Analytic thin opaque sheet at 0.28 < z < 0.34, vacuum elsewhere: a
    4-sample stage-1 (inclusive linspace over [0.2, 1.5] → world z ≈ −0.30,
    0.13, 0.57, 1.00) straddles it, the 16-sample budget hits it — so rays
    are genuinely ALIVE after stage-1 (saw only vacuum, t_rem = 1) AND
    budget-sensitive (refinement changes the result by ~the sheet color)."""
    bound = 1.0

    def apply(self, variables, *args, method=None):
        if method == "density":
            x = args[0]
            inside = (x[:, 2] > 0.28) & (x[:, 2] < 0.34)
            return jnp.where(inside, 80.0, 0.0), x
        if method == "color":
            d, g = args
            return jax.nn.sigmoid(g)
        if method == "semantics":
            g = args[0]
            return jax.nn.softmax(
                jnp.stack([g[:, 0], g[:, 1], g[:, 2], -g[:, 0]], -1))
        raise ValueError(method)


def test_early_stop_padding_cannot_steal_refine_slots():
    """render_rays_early_stop(valid=...): filler lanes (the staged render's
    padding) must never win top-K refine slots over real alive rays
    (round-3 review finding). Lanes [0:h) are marked invalid and carry
    EXACT COPIES of the real rays in [h:2h): their residuals tie at 1.0,
    and top_k breaks ties toward the lower (invalid) index — without the
    mask every refine slot would go to the filler lanes and the real rays
    would keep their empty stage-1 result."""
    from dataclasses import replace

    from ucsa_neural_rendering_tpu.ops.renderer import render_rays_early_stop

    model = _SheetModel()
    h = 8
    ro = jnp.tile(jnp.array([[0.05, -0.05, -0.5]]), (h, 1))
    tilt = jnp.linspace(-0.05, 0.05, h)[:, None]
    rd = jnp.concatenate([tilt, jnp.zeros_like(tilt),
                          jnp.ones_like(tilt)], -1)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dn = jnp.ones((h,))
    ro2 = jnp.concatenate([ro, ro], 0)
    rd2 = jnp.concatenate([rd, rd], 0)
    dn2 = jnp.concatenate([dn, dn], 0)
    valid = jnp.concatenate([jnp.zeros(h, bool), jnp.ones(h, bool)])

    cfg = RenderConfig(num_steps=16, upsample_steps=16, stage1_steps=4,
                       refine_fraction=0.5, early_stop=True)
    out = render_rays_early_stop(model, {}, ro2, rd2, dn2, cfg, valid=valid)
    full = render_rays(model, {}, ro, rd, dn, None,
                       RenderConfig(num_steps=16, upsample_steps=16))
    cfg_a = replace(cfg, num_steps=cfg.stage1_steps, upsample_steps=0,
                    early_stop=False)
    stage1 = render_rays(model, {}, ro, rd, dn, None, cfg_a)

    # non-vacuity: stage-1 really missed the sheet (alive, empty render)
    # while the full budget caught it
    assert np.asarray(jnp.sum(stage1["semantics"], -1)).max() < 1e-4
    assert np.abs(np.asarray(stage1["image"])
                  - np.asarray(full["image"])).max() > 0.1
    # real (valid) lanes were refined to the full-budget result
    for kname in ("image", "semantics", "depth"):
        np.testing.assert_allclose(np.asarray(out[kname][h:]),
                                   np.asarray(full[kname]), atol=1e-5)
    # invalid filler lanes keep their stage-1 result (never refined)
    np.testing.assert_allclose(np.asarray(out["image"][:h]),
                               np.asarray(stage1["image"]), atol=1e-6)


def test_staged_render_matches_unstaged(tiny_model):
    """Chunked full-frame render must equal the single-batch render."""
    model, variables = tiny_model
    cfg = RenderConfig(num_steps=16, upsample_steps=16, max_ray_batch=40)
    frames, intr = make_synthetic_scene(1, 8, 13)  # 104 rays, 40-chunks → pad
    rays = get_rays(jnp.asarray(frames[0]["pose"]), jnp.asarray(intr), 8, 13)
    full = render_rays(model, variables, rays["rays_o"], rays["rays_d"],
                       rays["direction_norms"], None, cfg)
    staged = render_rays_staged(model, variables, rays["rays_o"],
                                rays["rays_d"], rays["direction_norms"], cfg)
    for k in full:
        np.testing.assert_allclose(np.asarray(staged[k]), np.asarray(full[k]),
                                   rtol=2e-2, atol=1e-5)


def test_deterministic_without_key(tiny_model):
    model, variables = tiny_model
    cfg = RenderConfig(num_steps=16, upsample_steps=16)
    rays_o = jnp.zeros((8, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    dn = jnp.ones((8,))
    a = render_rays(model, variables, rays_o, rays_d, dn, None, cfg)
    b = render_rays(model, variables, rays_o, rays_d, dn, None, cfg)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))


def test_normalize_semantics():
    sem = jnp.array([[0.2, 0.2], [0.0, 0.0]])
    out, invalid = normalize_semantics(sem)
    np.testing.assert_allclose(np.asarray(out),
                               [[0.5, 0.5], [0.5, 0.5]], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(invalid), [False, True])


def test_depth_is_zdepth(tiny_model):
    """With an opaque field, depth ≈ (distance to surface)/direction_norm."""
    model, variables = tiny_model

    # overfit-free check: hand-build a delta-like density by monkeypatching is
    # overkill; instead verify depth < far plane and scales with dn
    cfg = RenderConfig(num_steps=32, upsample_steps=0)
    rays_o = jnp.zeros((4, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    dn = jnp.array([1.0, 1.1, 1.2, 1.3])
    out = render_rays(model, variables, rays_o, rays_d, dn, None, cfg)
    d = np.asarray(out["depth"])
    ratio = d * np.asarray(dn)
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-5)


class _WallModel:
    """Analytic opaque wall at z > 0.3 (duck-typed SemanticNeRF)."""
    bound = 1.0

    def apply(self, variables, *args, method=None):
        if method == "density":
            x = args[0]
            return jnp.where(x[:, 2] > 0.3, 80.0, 0.0), x
        if method == "color":
            d, g = args
            return jax.nn.sigmoid(g)
        if method == "semantics":
            g = args[0]
            return jax.nn.softmax(
                jnp.stack([g[:, 0], g[:, 1], g[:, 2], -g[:, 0]], -1))
        raise ValueError(method)


def test_early_stop_render_matches_full():
    """Early-termination render: saturated rays keep the cheap stage-1
    result (≈ full render once transmittance is gone); alive rays are
    compacted and re-rendered at the full budget (== full render exactly,
    same deterministic sampling)."""
    from dataclasses import replace
    from ucsa_neural_rendering_tpu.ops.renderer import render_rays_early_stop

    model = _WallModel()
    n_wall, n_empty = 48, 16
    o = jnp.tile(jnp.array([[0.05, -0.05, -0.5]]), (n_wall + n_empty, 1))
    d_wall = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_wall, 1))
    d_empty = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n_empty, 1))
    d = jnp.concatenate([d_wall, d_empty], 0)
    # make wall rays distinct (slight x tilt), renormalized
    tilt = jnp.linspace(-0.3, 0.3, n_wall + n_empty)[:, None]
    d = d + jnp.concatenate([tilt, jnp.zeros_like(tilt),
                             jnp.zeros_like(tilt)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = jnp.ones((n_wall + n_empty,))

    # occupancy grid for the wall: early_stop's production pairing (stage-1
    # samples concentrate inside occupied cells, so the saturated rays'
    # cheap result lands on the surface)
    from ucsa_neural_rendering_tpu.ops.occupancy import (OccupancyConfig,
                                                         update_grid)
    grid = update_grid(jnp.zeros((32, 32, 32)),
                       lambda pts: jnp.where(pts[:, 2] > 0.3, 80.0, 0.0),
                       1.0, jax.random.key(0),
                       OccupancyConfig(resolution=32), chunk=4096)

    cfg = RenderConfig(num_steps=16, upsample_steps=16)
    cfg_es = replace(cfg, early_stop=True, stage1_steps=8,
                     refine_fraction=0.25)  # K = 16 = the alive rays
    full = render_rays(model, {}, o, d, dn, None, cfg, grid)
    es = render_rays_early_stop(model, {}, o, d, dn, cfg_es, grid)

    # alive (empty-space) rays got the identical full budget
    for k in full:
        np.testing.assert_allclose(np.asarray(es[k][n_wall:]),
                                   np.asarray(full[k][n_wall:]), atol=1e-5)
    # saturated rays: stage-1 result is equivalent up to sample placement
    np.testing.assert_allclose(np.asarray(es["image"][:n_wall]),
                               np.asarray(full["image"][:n_wall]), atol=0.06)
    np.testing.assert_allclose(np.asarray(es["depth"][:n_wall]),
                               np.asarray(full["depth"][:n_wall]), atol=0.06)
    # saturated rays really did terminate (weight saturated in stage 1)
    acc = np.asarray(es["semantics"][:n_wall]).sum(-1)
    assert (acc > 1 - 1e-4).all()


def test_early_stop_in_staged_render():
    from dataclasses import replace
    model = _WallModel()
    cfg = RenderConfig(num_steps=8, upsample_steps=8, max_ray_batch=40,
                       early_stop=True, stage1_steps=4)
    frames, intr = make_synthetic_scene(1, 8, 13)
    rays = get_rays(jnp.asarray(frames[0]["pose"]), jnp.asarray(intr), 8, 13)
    out = render_rays_staged(model, {}, rays["rays_o"], rays["rays_d"],
                             rays["direction_norms"], cfg)
    assert out["image"].shape == (104, 3)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


class _FogSheetModel:
    """High-frequency semi-transparent scene: 12 thin density sheets along
    z, each with its own semantic class and moderate opacity, so per-sample
    weights are SMALL (many below weight_mask_threshold) and transmittance
    decays slowly — the adversarial regime for the early-stop refine
    heuristic's masked-mass residual scoring (ops/renderer.py
    render_rays_early_stop)."""
    bound = 1.0

    def apply(self, variables, *args, method=None):
        if method == "density":
            x = args[0]
            # sheets of width 0.01 every 0.12 in z, density 6 → per-sheet
            # alpha ~ a few percent per sample at 32-step spacing
            z = x[:, 2]
            phase = jnp.abs(jnp.mod(z + 1.0, 0.12) - 0.06)
            sigma = jnp.where(phase < 0.01, 6.0, 0.0)
            return sigma, x
        if method == "color":
            d, g = args
            return jax.nn.sigmoid(g)
        if method == "semantics":
            g = args[0]
            # class = sheet index mod 4 (from z carried in the geo features)
            sheet = jnp.floor((g[:, 2] + 1.0) / 0.12).astype(jnp.int32) % 4
            return jax.nn.one_hot(sheet, 4) * 0.9 + 0.025
        raise ValueError(method)


def test_early_stop_label_contract_high_frequency():
    """VERDICT r3 #8, made precise. The early-stop render's label guarantee
    is a CONTRACT, not unconditional agreement: (a) rays refined at the
    full budget match the flat full-budget render exactly; (b) unrefined
    rays carry the stage-1 (half-budget) result, so overall agreement with
    the full render is never below the flat stage-1 render's agreement —
    refinement can only help; (c) the aggregate improvement from the
    residual-mass refine scoring is real (strictly better than stage-1 on
    this scene). On an adversarial unsaturated high-frequency scene (thin
    semi-transparent sheets — most weights sub-threshold, label argmax
    genuinely budget-sensitive) agreement is quantified and recorded in
    PARITY.md; on saturating scenes (real rooms) labels measured
    bit-identical (PERFORMANCE.md render tables)."""
    from dataclasses import replace

    from ucsa_neural_rendering_tpu.ops.renderer import render_rays_early_stop

    model = _FogSheetModel()
    n = 256
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.stack([rng.uniform(-0.3, 0.3, n),
                              rng.uniform(-0.3, 0.3, n),
                              np.full(n, -0.95)], -1).astype(np.float32))
    d = np.stack([rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n),
                  np.ones(n)], -1)
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    dn = jnp.ones((n,))

    cfg = RenderConfig(num_steps=32, upsample_steps=32)
    full = render_rays(model, {}, o, d, dn, None, cfg)
    sem_full, _ = normalize_semantics(full["semantics"])
    lab_full = np.asarray(jnp.argmax(sem_full, -1))

    # the scene is in the adversarial regime: the vast majority of rays
    # never saturate (grazing-angle rays crossing many sheets may), so the
    # refine choice is driven by the residual-mass heuristic
    acc = np.asarray(full["semantics"]).sum(-1)
    assert (acc < 1 - 1e-4).mean() > 0.9

    stage1, k = 16, 0.25  # the derived test-default shape
    # the actual stage-1 program inside render_rays_early_stop: stage1
    # stratified samples, NO importance pass
    cfg_s1 = RenderConfig(num_steps=stage1, upsample_steps=0)
    s1 = render_rays(model, {}, o, d, dn, None, cfg_s1)
    sem_s1, _ = normalize_semantics(s1["semantics"])
    lab_s1 = np.asarray(jnp.argmax(sem_s1, -1))
    agree_s1 = float((lab_s1 == lab_full).mean())

    cfg_es = replace(cfg, early_stop=True, stage1_steps=stage1,
                     refine_fraction=k)
    es = render_rays_early_stop(model, {}, o, d, dn, cfg_es)
    sem_es, _ = normalize_semantics(es["semantics"])
    lab_es = np.asarray(jnp.argmax(sem_es, -1))
    agree_es = float((lab_es == lab_full).mean())

    # (a) every ray whose early-stop output differs from stage-1 was
    # refined at the full budget → must match the full render's label
    refined = np.any(np.asarray(es["semantics"]) != np.asarray(
        s1["semantics"]), axis=-1)
    assert refined.sum() >= 1
    np.testing.assert_array_equal(lab_es[refined], lab_full[refined])
    # (b) refinement can only help overall agreement
    assert agree_es >= agree_s1, (agree_es, agree_s1)
    # (c) the heuristic really spends ~K slots on distinct rays, and the
    # measured lift on this worst case is substantial (PARITY.md records
    # 0.371 vs 0.176 — refined rays exact, unrefined rays at stage-1
    # quality; the stated bound is agree_es - agree_s1 >= 0.15 here)
    assert refined.mean() >= k * 0.9, refined.mean()
    assert agree_es - agree_s1 >= 0.15, (agree_es, agree_s1)
