"""Stratified face-sampled encoding (`stochastic_fwd="face"`) tests.

The face estimator samples ONE axis bit per (point, level) — the axis whose
frac is most certain — and blends the resulting cell face exactly with
bilinear weights (models/hash_encoding.py hash_encode_stochastic_face). It
sits between the exact trilinear forward (8 gather rows) and the fully
stochastic one (1 row): 4 rows at strictly lower estimator variance than
single-corner sampling. These tests pin its math on CPU:
  * forward unbiasedness (statistical, over random positions) and exactness
    when the sampled axis's frac is 0 (the draw is then certain);
  * lower forward error than the single-corner estimator on the same points;
  * backward: total-mass identity and correlation against the exact
    trilinear adjoint, and support containment (gradient rows are a subset
    of the rows the forward read);
  * trainer-step integration at the 16x2 geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.models import SemanticNeRF
from ucsa_neural_rendering_tpu.models.hash_encoding import (
    hash_encode, hash_encode_face_sampled, hash_encode_sampled,
    hash_encode_stochastic_face, make_spec, sampled_face_rows)
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
from ucsa_neural_rendering_tpu.train import NeRFTrainer


def _spec(levels=2, feats=2):
    return make_spec(n_levels=levels, n_features=feats, base_resolution=4,
                     per_level_scale=2.0, log2_hashmap_size=8)


def test_face_weights_sum_to_one(rng):
    spec = _spec()
    x = jnp.asarray(rng.uniform(0, 1, (512, 3)).astype(np.float32))
    idx, w = sampled_face_rows(x, spec)
    assert idx.shape == (512, spec.n_levels, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-5)


def test_face_exact_when_sampled_axis_on_vertex(rng):
    """If one axis sits exactly on a grid plane its frac is 0 — the adaptive
    axis choice picks it, the Bernoulli draw is certain, and the face blend
    IS the exact trilinear blend."""
    spec = make_spec(n_levels=1, n_features=2, base_resolution=4,
                     per_level_scale=1.0, log2_hashmap_size=8)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2))
                        .astype(np.float32))
    # x on the res-4 grid planes along axis 0; fractional elsewhere
    x = jnp.stack([jnp.full((64,), 0.5),
                   jnp.asarray(rng.uniform(0.05, 0.95, 64)),
                   jnp.asarray(rng.uniform(0.05, 0.95, 64))], axis=1)
    exact = hash_encode(table, x, spec, compute_dtype=jnp.float32)
    face = hash_encode_face_sampled(table, x, spec,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(face), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)


def test_face_forward_unbiased_and_lower_variance(rng):
    """Over many random positions the face estimate matches the exact blend
    in expectation, with smaller mean error than the single-corner
    estimator on the SAME points (stratification can only reduce
    variance)."""
    spec = _spec()
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2))
                        .astype(np.float32))
    n = 40000
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    exact = np.asarray(hash_encode(table, x, spec,
                                   compute_dtype=jnp.float32))
    face = np.asarray(hash_encode_face_sampled(table, x, spec,
                                               compute_dtype=jnp.float32))
    corner = np.asarray(hash_encode_sampled(table, x, spec,
                                            compute_dtype=jnp.float32))
    # unbiasedness: the mean deviation shrinks ~1/sqrt(n); the per-point
    # deviation does not
    assert abs((face - exact).mean()) < 5e-3
    face_err = np.abs(face - exact).mean()
    corner_err = np.abs(corner - exact).mean()
    assert face_err < corner_err * 0.75, (face_err, corner_err)


def test_face_backward_mass_correlation_and_support(rng):
    spec = _spec()
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2))
                        .astype(np.float32)) * 0.01
    n = 20000
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec)
                                   .astype(jnp.float32)))(table)
    gf = jax.grad(lambda t: jnp.sum(hash_encode_stochastic_face(t, x, spec)
                                    .astype(jnp.float32)))(table)
    # unweighted single-row scatter per (point, level): total mass is exact
    assert abs(float(jnp.sum(gf)) - n * spec.n_levels * spec.n_features) < 4.0
    a = np.asarray(g).ravel()
    b = np.asarray(gf).ravel()
    mask = np.abs(a) > 1e-8
    corr = np.corrcoef(a[mask], b[mask])[0, 1]
    assert corr > 0.9, corr
    # support containment: every gradient row was read by the forward
    idx, _ = sampled_face_rows(x, spec)
    read = np.zeros(spec.table_size, bool)
    read[np.asarray(idx).ravel()] = True
    touched = np.abs(np.asarray(gf)).max(axis=1) > 0
    assert not np.any(touched & ~read)


def test_trainer_step_with_face_mode(rng):
    H, W = 12, 16
    model = SemanticNeRF(bound=1.0, num_semantic_classes=5, n_levels=4,
                         log2_hashmap_size=12, stochastic_fwd="face")
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


def test_packed_face_hybrid_forward(rng):
    """hash_encode_packed_face: coarse (packed) levels exact, fine levels
    face-sampled — unbiased vs the exact encode, exact when every level is
    packed, and the trainer dispatches it under the default train packing."""
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        hash_encode_hybrid_face_train)
    from ucsa_neural_rendering_tpu.models.packed_table import (
        build_packed_table, choose_n_packed, hash_encode_packed,
        hash_encode_packed_face)

    spec = make_spec(n_levels=4, n_features=2, base_resolution=4,
                     per_level_scale=2.0, log2_hashmap_size=10)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2))
                        .astype(np.float32))
    n = 20000
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    # k = 2 of 4 levels packable at a 512-cell budget (res 4, 8; not 16, 32)
    k = choose_n_packed(spec, 512)
    assert 0 < k < spec.n_levels
    packed = build_packed_table(table, spec, k, dtype=jnp.float32)
    exact = np.asarray(hash_encode(table, x, spec,
                                   compute_dtype=jnp.float32))
    face = np.asarray(hash_encode_packed_face(table, packed, x, spec,
                                              compute_dtype=jnp.float32))
    f = spec.n_features
    # packed prefix is EXACT per point (bit-level up to blend order)
    np.testing.assert_allclose(face[:, :k * f], exact[:, :k * f],
                               rtol=1e-5, atol=1e-5)
    # fine suffix is unbiased with bounded per-point deviation
    assert abs((face[:, k * f:] - exact[:, k * f:]).mean()) < 5e-3

    # all-levels-packed degenerates to the exact packed encode
    pk_all = build_packed_table(table, spec, spec.n_levels,
                                dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hash_encode_packed_face(table, pk_all, x, spec,
                                           compute_dtype=jnp.float32)),
        np.asarray(hash_encode_packed(table, pk_all, x, spec,
                                      compute_dtype=jnp.float32)),
        rtol=1e-6, atol=1e-6)

    # custom-VJP wrapper: backward is the single-corner estimator — total
    # gradient mass of sum(out) is exactly one row per (point, level)
    gt = jax.grad(lambda t: jnp.sum(
        hash_encode_hybrid_face_train(t, packed, x, spec)
        .astype(jnp.float32)))(table)
    assert abs(float(jnp.sum(gt)) - n * spec.n_levels * f) < 4.0

    # support containment on the FINE (face-sampled) levels: the backward
    # draw must stay WITHIN the forward's face (regression for the biased
    # _hesg_bwd pairing, whose trilinear-CDF draw consumes the same salt-0
    # uniform as the face choice and lands on the OPPOSITE side of the
    # sampled axis for small u — rows the forward never read). Few points,
    # so their face rows don't blanket the hashed levels and the check has
    # teeth (64 pts x 4 rows < the 1024-row fine levels).
    xs = x[:64]
    gts = jax.grad(lambda t: jnp.sum(
        hash_encode_hybrid_face_train(t, packed, xs, spec)
        .astype(jnp.float32)))(table)
    face_idx, _ = sampled_face_rows(xs, spec)           # [N, L, 4] global
    fine_read = np.unique(np.asarray(face_idx[:, k:, :]).reshape(-1))
    lo = int(spec.offsets[k])
    fine_written = (np.nonzero(np.abs(np.asarray(gts[lo:]).sum(-1)) > 0)[0]
                    + lo)
    assert len(fine_written) > 32          # the check isn't vacuous
    assert np.isin(fine_written, fine_read).all()


def test_trainer_step_face_with_packing(rng):
    """stochastic_fwd="face" + train packing dispatches the packed face
    hybrid and trains finitely."""
    H, W = 12, 16
    model = SemanticNeRF(bound=1.0, num_semantic_classes=5, n_levels=4,
                         log2_hashmap_size=12, stochastic_fwd="face")
    cfg = RenderConfig(num_steps=8, upsample_steps=8, occ_candidates=16,
                       train_packed_max_entries=512)
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
    key = jax.random.key(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        assert np.isfinite(float(parts["loss_nerf_total"]))
