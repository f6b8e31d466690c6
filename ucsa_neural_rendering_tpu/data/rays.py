"""Camera geometry: NGP pose convention + pinhole ray generation.

Equivalents of the reference's ray utilities
(ref: nr4seg/dataset/ngp_utils.py:7-69 and the random-pixel variant at
nr4seg/lightning/joint_train_lightning_net.py:108-157). Implemented in JAX so
they fuse into the jitted train/render steps; `nerf_matrix_to_ngp` is numpy
(host-side pose preprocessing).
"""

import jax
import jax.numpy as jnp
import numpy as np


def nerf_matrix_to_ngp(pose: np.ndarray) -> np.ndarray:
    """NeRF/OpenGL c2w → instant-ngp axis convention: cyclic (x,y,z)→(y,z,x)
    row permutation with y/z column negation (ref: ngp_utils.py:7-17)."""
    pose = np.asarray(pose)
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def _pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, intrinsics: jnp.ndarray):
    """Pixel centers (i: col + 0.5, j: row + 0.5) → camera-space directions
    and their norms. Returns (unit_dirs [N,3], norms [N])."""
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1], intrinsics[2],
                      intrinsics[3])
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    zs = jnp.ones_like(i)
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    norms = jnp.linalg.norm(dirs, axis=-1)
    return dirs / norms[..., None], norms


def get_rays(pose: jnp.ndarray, intrinsics: jnp.ndarray, H: int, W: int):
    """Full-image rays for one c2w pose (ref: ngp_utils.py:29-69).

    Returns dict rays_o [H*W,3], rays_d [H*W,3], direction_norms [H*W],
    row-major pixel order (matching reference's transposed meshgrid).
    """
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    i = ii.reshape(-1) + 0.5
    j = jj.reshape(-1) + 0.5
    dirs, norms = _pixel_dirs(i, j, intrinsics)
    # full-precision matmul: camera geometry must not go through bf16
    rays_d = jnp.matmul(dirs, pose[:3, :3].T,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "direction_norms": norms}


def get_rays_sampled(pose: jnp.ndarray, intrinsics: jnp.ndarray, H: int,
                     W: int, key: jax.Array, n_rays: int = 4096):
    """N random-pixel rays for one pose — the reference's training-time ray
    sampler (ref: joint_train_lightning_net.py:108-157, uniform with
    replacement over H*W pixels).

    Returns (rays_o [N,3], rays_d [N,3], direction_norms [N], inds [N]).
    """
    inds = jax.random.randint(key, (n_rays,), 0, H * W)
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    dirs, norms = _pixel_dirs(i, j, intrinsics)
    rays_d = jnp.matmul(dirs, pose[:3, :3].T,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d, norms, inds
