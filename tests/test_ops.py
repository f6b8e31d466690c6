"""Geometry + sampling + compositing unit tests vs dense NumPy oracles
(SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.ops import (composite, composite_weights,
                                           near_far_from_aabb, sample_pdf,
                                           stratified_samples)


def _brute_force_near_far(o, d, lo, hi, min_near=0.2, n=100000):
    """Oracle: march t densely, find first/last t where point inside box."""
    t = np.linspace(min_near, 40.0, n)
    pts = o[None, :] + t[:, None] * d[None, :]
    inside = np.all((pts >= lo) & (pts <= hi), axis=1)
    if not inside.any():
        return None
    ts = t[inside]
    return ts[0], ts[-1]


def test_near_far_vs_brute_force(rng):
    aabb = jnp.array([-2.0, -2, -2, 2, 2, 2])
    for _ in range(30):
        o = rng.uniform(-5, 5, 3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        near, far = near_far_from_aabb(jnp.asarray(o[None]), jnp.asarray(d[None]),
                                       aabb)
        bf = _brute_force_near_far(o, d, -2, 2)
        if bf is None:
            assert float(near[0]) >= float(far[0]) - 1e-3  # degenerate
        else:
            assert abs(float(near[0]) - bf[0]) < 2e-3
            assert abs(float(far[0]) - bf[1]) < 2e-3


def test_near_far_inside_box():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[0.0, 0, 1]])
    near, far = near_far_from_aabb(o, d, aabb)
    assert abs(float(near[0]) - 0.2) < 1e-6  # min_near clamp
    assert abs(float(far[0]) - 1.0) < 1e-6


def test_stratified_samples_bounds_and_order():
    nears = jnp.array([1.0, 2.0])
    fars = jnp.array([3.0, 6.0])
    z = stratified_samples(nears, fars, 32, jax.random.key(0))
    z = np.asarray(z)
    assert z.shape == (2, 32)
    assert (np.diff(z, axis=-1) >= 0).all()  # stratified → still sorted
    assert (z[:, 0] >= np.array([1.0, 2.0]) - 1e-6).all()
    assert (z[:, -1] <= np.array([3.0, 6.0]) + 1e-6).all()
    # deterministic version is exactly linspace
    zd = np.asarray(stratified_samples(nears, fars, 5, None))
    np.testing.assert_allclose(zd[0], np.linspace(1, 3, 5), rtol=1e-6)


def test_sample_pdf_statistics():
    """Samples should concentrate where the weights are."""
    n_rays, t = 4, 64
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, t), (n_rays, t))
    w = np.zeros((n_rays, t - 1), np.float32)
    w[:, 40:50] = 1.0  # all mass in bins 40..50 → z in ~[0.63, 0.79]
    s = sample_pdf(bins, jnp.asarray(w), 512, jax.random.key(1))
    s = np.asarray(s)
    frac_in = ((s > 0.60) & (s < 0.82)).mean()
    assert frac_in > 0.97
    # deterministic midpoint sampling covers the same range
    sd = np.asarray(sample_pdf(bins, jnp.asarray(w), 64, None))
    assert ((sd > 0.55) & (sd < 0.85)).mean() > 0.95


def _numpy_composite(z, sigma, rgb, sem, dirn, scale=1.0, thr=1e-4):
    deltas = np.diff(z, axis=-1)
    deltas = np.concatenate([deltas, np.full_like(deltas[..., :1], 1e10)], -1)
    alphas = 1 - np.exp(-deltas * scale * sigma)
    shifted = np.concatenate([np.ones_like(alphas[..., :1]),
                              1 - alphas + 1e-15], -1)
    weights = alphas * np.cumprod(shifted, -1)[..., :-1]
    w = np.where(weights > thr, weights, 0.0)
    img = (w[..., None] * rgb).sum(-2)
    s = (w[..., None] * sem).sum(-2)
    depth = (w * z).sum(-1) / dirn
    return weights, img, s, depth


def test_compositing_vs_numpy_oracle(rng):
    n, t, c = 8, 32, 5
    z = np.sort(rng.uniform(0.2, 4.0, (n, t))).astype(np.float32)
    sigma = rng.uniform(0, 8, (n, t)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, t, 3)).astype(np.float32)
    sem = rng.uniform(0, 1, (n, t, c)).astype(np.float32)
    dirn = rng.uniform(1.0, 1.3, n).astype(np.float32)

    w = composite_weights(jnp.asarray(z), jnp.asarray(sigma))
    img, s, depth = composite(w, jnp.asarray(z), jnp.asarray(rgb),
                              jnp.asarray(sem), jnp.asarray(dirn))

    w_np, img_np, s_np, d_np = _numpy_composite(z, sigma, rgb, sem, dirn)
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img), img_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), d_np, rtol=1e-4, atol=1e-5)


def test_composite_weights_sum_to_one_for_opaque():
    """A very dense field should give total weight ≈ 1 (fully absorbed)."""
    z = jnp.broadcast_to(jnp.linspace(0.2, 4.0, 64), (2, 64))
    sigma = jnp.full((2, 64), 100.0)
    w = composite_weights(z, sigma)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-4)


def test_semantics_gradient_does_not_touch_density():
    """composite() must stop gradients from the semantic output into weights
    (ref detaches weights for semantics)."""
    z = jnp.broadcast_to(jnp.linspace(0.2, 4.0, 16), (1, 16))
    rgb = jnp.ones((1, 16, 3)) * 0.5
    sem = jnp.ones((1, 16, 4)) * 0.25
    dirn = jnp.ones((1,))

    def sem_loss(sigma):
        w = composite_weights(z, sigma)
        _, s, _ = composite(w, z, rgb, sem, dirn)
        return jnp.sum(s)

    g = jax.grad(sem_loss)(jnp.full((1, 16), 1.0))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def rgb_loss(sigma):
        w = composite_weights(z, sigma)
        img, _, _ = composite(w, z, rgb, sem, dirn)
        return jnp.sum(img)

    g2 = jax.grad(rgb_loss)(jnp.full((1, 16), 1.0))
    assert np.abs(np.asarray(g2)).sum() > 0
