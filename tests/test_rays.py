"""Camera geometry tests (ref semantics: nr4seg/dataset/ngp_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.data import (get_rays, get_rays_sampled,
                                            nerf_matrix_to_ngp)


def _torch_reference_get_rays(pose, intrinsics, H, W):
    """NumPy transliteration of the reference get_rays for oracle testing."""
    fx, fy, cx, cy = intrinsics
    i, j = np.meshgrid(np.linspace(0, W - 1, W), np.linspace(0, H - 1, H),
                       indexing="ij")
    i = i.T.reshape(-1) + 0.5
    j = j.T.reshape(-1) + 0.5
    zs = np.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    dirs = np.stack([xs, ys, zs], -1)
    norms = np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / norms
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d, norms[:, 0]


def test_get_rays_matches_reference_math(rng):
    H, W = 12, 16
    intr = np.array([100.0, 110.0, 8.0, 6.0], np.float32)
    # random valid c2w
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    r = u @ vt
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = r
    pose[:3, 3] = rng.normal(size=3)

    out = get_rays(jnp.asarray(pose), jnp.asarray(intr), H, W)
    ro_ref, rd_ref, dn_ref = _torch_reference_get_rays(pose, intr, H, W)
    np.testing.assert_allclose(np.asarray(out["rays_o"]), ro_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rays_d"]), rd_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["direction_norms"]), dn_ref,
                               atol=1e-5)


def test_get_rays_sampled_consistent_with_full():
    H, W = 10, 14
    intr = jnp.array([90.0, 95.0, 7.0, 5.0])
    pose = jnp.eye(4)
    full = get_rays(pose, intr, H, W)
    ro, rd, dn, inds = get_rays_sampled(pose, intr, H, W, jax.random.key(3),
                                        n_rays=64)
    inds = np.asarray(inds)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(full["rays_d"])[inds], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dn),
                               np.asarray(full["direction_norms"])[inds],
                               atol=1e-6)


def test_nerf_matrix_to_ngp_structure():
    pose = np.arange(16, dtype=np.float32).reshape(4, 4)
    ngp = nerf_matrix_to_ngp(pose)
    # row permutation (1,2,0) with column sign flips on columns 1,2
    expect = np.array([
        [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]],
        [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]],
        [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]],
        [0, 0, 0, 1],
    ], np.float32)
    np.testing.assert_array_equal(ngp, expect)
    # rotation part stays a rotation for a valid pose
    r = np.linalg.qr(np.random.default_rng(1).normal(size=(3, 3)))[0]
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = r
    out = nerf_matrix_to_ngp(p)
    np.testing.assert_allclose(out[:3, :3] @ out[:3, :3].T, np.eye(3),
                               atol=1e-5)
