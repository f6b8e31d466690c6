"""Alpha compositing along rays.

Equivalent of the reference's Python compositing
(ref: nr4seg/nerf/renderer_semantics.py:238-285) and — in spirit — of its
dead CUDA composite kernels (raymarching.cu:318-520): alpha from density and
interval length, transmittance via exclusive cumprod, and weighted reduction
of rgb / semantics / depth. Dense + static shapes; the reference's dynamic
`weights > 1e-4` gather becomes a `where` mask (the masked MLP evaluation
itself lives in the renderer). Accumulation is fp32 even when the MLP
outputs are bf16.
"""

import jax.numpy as jnp


def composite_weights(z_vals: jnp.ndarray, sigmas: jnp.ndarray,
                      density_scale: float = 1.0):
    """[N, T] z-values + densities → per-sample compositing weights [N, T].

    alpha_i   = 1 - exp(-delta_i * scale * sigma_i)
    T_i       = prod_{j<i} (1 - alpha_j + 1e-15)
    weight_i  = alpha_i * T_i
    with delta_last = 1e10 (ref renderer_semantics.py:185-198,238-247).
    """
    z_vals = z_vals.astype(jnp.float32)
    sigmas = sigmas.astype(jnp.float32)
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]],
                            axis=-1)  # exclusive
    return alphas * trans


def composite(weights: jnp.ndarray, z_vals: jnp.ndarray, rgbs: jnp.ndarray,
              semantics: jnp.ndarray, direction_norms: jnp.ndarray,
              weight_mask_threshold: float = 1e-4):
    """Weighted reduction to per-ray rgb [N,3], semantics [N,C], depth [N].

    Depth is sum(w * z) / ||unnormalized pixel direction||, converting
    distance-along-ray to z-depth (ref renderer_semantics.py:274-277).
    Weights below the threshold are zeroed for the rgb/semantics reductions,
    mirroring the reference's masked-MLP + weight zeroing
    (ref renderer_semantics.py:249-283). The semantic reduction uses
    DETACHED weights (`lax.stop_gradient`), matching the reference's
    `weights_semantics = weights.clone().detach()` — the semantics loss
    trains the semantics head but not the density field.
    """
    from jax import lax
    w = jnp.where(weights > weight_mask_threshold, weights, 0.0)
    image = jnp.sum(w[..., None] * rgbs.astype(jnp.float32), axis=-2)
    w_sem = lax.stop_gradient(w)
    sem = jnp.sum(w_sem[..., None] * semantics.astype(jnp.float32), axis=-2)
    depth = jnp.sum(w * z_vals, axis=-1) / direction_norms
    return image, sem, depth
