"""Gaussian negative log-likelihood with a std floor.

Matches `negative_gaussian_loglikelihood` in the reference eval harness
(`/root/reference/nerfuncertainty/scripts/eval_uncertainty.py:404-412`): the
predictive std is broadcast over channels, floored at ``eps`` (RGB floor 3e-2,
depth floor 1.0 / 2.0 in the eval configs), and the per-element NLL is
``0.5*log(2*pi*sigma^2) + (target-mean)^2 / (2*sigma^2)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


@jax.jit
def gaussian_nll(
    preds: jax.Array, targets: jax.Array, stds: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Per-element negative Gaussian log-likelihood.

    Args:
      preds: (..., c) predictive means.
      targets: (..., c) ground truth.
      stds: (...,) or (..., 1) predictive std, shared across the c channels.
      eps: std floor.

    Returns:
      (n, c) NLL values where n = prod of leading dims (reference-flat shape).
    """
    c = preds.shape[-1]
    preds = preds.reshape(-1, c).astype(jnp.float32)
    targets = targets.reshape(-1, c).astype(jnp.float32)
    stds = jnp.maximum(stds.reshape(-1, 1).astype(jnp.float32), eps)
    var = stds * stds
    return (
        0.5 * jnp.log(2.0 * math.pi * var)
        + (targets - preds) ** 2 / (2.0 * var)
    )
