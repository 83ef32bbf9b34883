"""Activations for radiance fields.

``trunc_exp`` mirrors nerfstudio's truncated exponential (consumed by the
reference fields, e.g. `/root/reference/nerfuncertainty/models/laplace/
laplace_field.py` density activation choice): forward is ``exp(x)``, backward
clamps the input to [-15, 15] so density gradients cannot overflow in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_TRUNC_MAX = 15.0  # exp(15) ~ 3.3e6: far beyond any physical density, but
# finite — an unclamped exp overflows f32 around x~88, and an inf density
# meeting a zero-width PDF bin (delta == 0) produces inf*0 = NaN weights
# (observed as a late-training collapse at lr-schedule tail)


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(jnp.minimum(x, _TRUNC_MAX))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.minimum(x, _TRUNC_MAX)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -_TRUNC_MAX, _TRUNC_MAX)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def shifted_softplus(x: jax.Array, beta_min: float = 0.0) -> jax.Array:
    """Softplus + beta_min floor, the aleatoric-variance activation
    (`activenerfacto_field.py:120-121,190` semantics)."""
    return jax.nn.softplus(x) + beta_min
