"""Truncated-gradient exponential density activation.

Equivalent of the reference's `trunc_exp` autograd Function
(ref: nr4seg/nerf/activation.py:7-22): forward is exp(x) in fp32, backward
clamps x to [-15, 15] before the exp so a single exploding density sample
cannot blow up the gradient.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _trunc_exp_f32(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


_trunc_exp_f32.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def trunc_exp(x):
    """exp with gradient clamped at |x| = 15; computed in fp32 regardless of
    input dtype (the cast sits outside the custom_vjp so cotangent dtypes
    stay consistent)."""
    return _trunc_exp_f32(x.astype(jnp.float32))
