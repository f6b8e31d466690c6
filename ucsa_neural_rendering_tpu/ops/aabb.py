"""Ray/AABB intersection.

The reference's only live CUDA kernel on the training hot path is
`kernel_near_far_from_aabb` (ref: nr4seg/nerf/raymarching/src/
raymarching.cu:62-126, called from nr4seg/nerf/renderer_semantics.py:150):
a per-ray slab test against the cubic scene AABB with a `min_near` clamp.
On TPU this is a handful of fused VPU ops — no kernel needed; it jits and
fuses into the surrounding render step.
"""

import jax.numpy as jnp

# miss rays' near/far value: far beyond any scene extent, but safe against
# f32 overflow in downstream sums (the CUDA kernel uses FLT_MAX, whose
# doubling is inf)
MISS_SENTINEL = 1e10


def near_far_from_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       aabb: jnp.ndarray, min_near: float = 0.2):
    """Slab test of N rays against one axis-aligned box.

    Args:
      rays_o: [..., 3] ray origins.
      rays_d: [..., 3] unit ray directions.
      aabb:   [6] (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: lower clamp on the near plane (ref default 0.2,
        nr4seg/nerf/raymarching/raymarching.py:16).

    Returns:
      (nears, fars): [...] entry/exit distances. Rays that miss the box get
      near == far == MISS_SENTINEL (1e10), the same DEGENERATE behaviour as
      the CUDA kernel's FLT_MAX (raymarching.cu:93-94,106-107): all samples
      land at the renderer's AABB clip corner. FLT_MAX itself is unsafe
      here — downstream midpoint sums (0.5*(z+z)) would overflow f32 to
      inf and inverse-CDF interpolation would produce inf−inf = NaN.
      (Returning a collapsed interval at min_near instead — the
      pre-round-3 behaviour — composited weight ~1 just in front of the
      camera and backpropagated rgb gradient into the density there.)
      One deliberate divergence: a ray whose box exit lies closer than
      min_near gets a zero-extent interval here, where the CUDA kernel
      leaves an INVERTED one (far < near → descending z, negative deltas);
      tested in test_reference_parity.py::test_near_far_matches_cuda_port.
    """
    eps = 1e-15
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps,
                            jnp.where(rays_d >= 0, eps, -eps), rays_d)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    t_near = jnp.minimum(t0, t1).max(axis=-1)
    t_far = jnp.maximum(t0, t1).min(axis=-1)
    miss = t_near > t_far  # disjoint slabs, tested before the clamps
    t_near = jnp.maximum(t_near, min_near)
    t_far = jnp.maximum(t_far, t_near)
    return (jnp.where(miss, MISS_SENTINEL, t_near),
            jnp.where(miss, MISS_SENTINEL, t_far))
