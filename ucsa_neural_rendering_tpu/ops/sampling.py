"""Ray sampling: stratified z-values + inverse-CDF importance sampling.

TPU-native (static-shape, fully vectorized) equivalents of the reference's
sampling (ref: nr4seg/nerf/renderer_semantics.py:154-218):
  * 256 stratified z-values in [near, far] with optional per-interval jitter;
  * `sample_pdf` — importance resampling of 256 more z-values from the
    coarse-pass compositing weights via inverse-CDF, using a vectorized
    `searchsorted` instead of torch.searchsorted+gather chains.
All shapes are static; randomness is threaded `jax.random` keys (the
reference uses global torch RNG).
"""

import jax
import jax.numpy as jnp


def stratified_samples(nears: jnp.ndarray, fars: jnp.ndarray, num_steps: int,
                       key: jax.Array | None = None):
    """[N] near/far → [N, T] z-values, uniformly spaced, optionally jittered.

    With a key, each z is resampled uniformly inside its interval between
    neighbouring midpoints — exactly the reference's perturbation scheme
    (ref: renderer_semantics.py:159-168).
    """
    n = nears[..., None]
    f = fars[..., None]
    t = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)
    z_vals = n + (f - n) * t  # [N, T]
    if key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z_vals.shape, dtype=jnp.float32)
        z_vals = lower + (upper - lower) * u
    return z_vals


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: jax.Array | None = None):
    """Inverse-CDF sampling of n_samples z-values per ray.

    Args:
      bins:    [N, T] bin positions (z-value midpoints).
      weights: [N, T-1] unnormalized bin weights.
      n_samples: number of samples to draw per ray.
      key: PRNG key; None → deterministic midpoints (ref `det=True`).

    Returns: [N, n_samples] sampled positions.
    Matches ref renderer_semantics.py:10-46 (incl. the 1e-5 weight floor and
    the denom<1e-5 guard).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, T]

    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples,
                         dtype=jnp.float32)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=jnp.float32)

    # Inverse-CDF bin lookup. For the bin counts this renderer uses (≤ 513
    # after the occupancy-candidate CDF), a dense compare-and-count on the
    # VPU is far cheaper than XLA's searchsorted lowering (a vmapped binary-
    # search loop — measured ~45 ms per 4096-ray chunk, which made sample
    # placement ~40% of a full frame; the dense form is sub-ms). Identical
    # result: side="right" insertion index == count of cdf entries <= u.
    # TPU-only: on CPU backends (tests, virtual meshes) the [N, S, T]
    # intermediate doesn't fuse and the O(log T) searchsorted is fine.
    if cdf.shape[-1] <= 513 and jax.default_backend() == "tpu":
        inds = jnp.sum((u[..., :, None] >= cdf[..., None, :]).astype(
            jnp.int32), axis=-1)
    else:
        inds = jax.vmap(
            lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1),
                                 axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1),
                                 axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
