"""Area Under the Calibration Error curve (AUCE) for Gaussian intervals.

Semantics match the reference (`/root/reference/nerfuncertainty/metrics/
auce.py:10-57`, adapted there from evaluating_bdl): for the 99 significance
levels alpha in {0.01, ..., 0.99} build central Gaussian prediction intervals
``mu +- Phi^{-1}(1 - alpha/2) * sigma``, measure empirical coverage and mean
interval length, and integrate (trapezoid over alpha):

  * ``auc_abs_error``  — |coverage - (1 - alpha)|
  * ``auc_length``     — average interval length
  * ``auc_neg_error``  — negative part of the coverage error

The reference materializes the (99, n) interval tensor per alpha in a numpy
loop; here coverage for all alphas is one sort + ``searchsorted`` on the
standardized |target - mu| / sigma residuals (O(n log n) total), and lengths
reduce to ``2 * z_alpha * mean(sigma)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as jnorm

NUM_ALPHAS = 99


@jax.jit
def auce(
    mean_values: jax.Array,
    sigma_values: jax.Array,
    target_values: jax.Array,
    mask: jax.Array | None = None,
):
    """Calibration metric for Gaussian predictive distributions.

    Args:
      mean_values: (n,) predictive means.
      sigma_values: (n,) predictive standard deviations (>= 0).
      target_values: (n,) ground-truth values.
      mask: optional (n,) bool; when given, equals `auce` on the masked
        SUBSET exactly (invalid residuals count as never covered, masked
        means), with no host boolean indexing.

    Returns:
      dict with the same keys as the reference: per-alpha ``coverage_values``,
      ``avg_length_values``, ``coverage_error_values``,
      ``abs_coverage_error_values``, ``neg_coverage_error_values`` (each of
      length 99) and scalar ``auc_abs_error_values``, ``auc_length_values``,
      ``auc_neg_error_values``.
    """
    mean_values = mean_values.reshape(-1).astype(jnp.float32)
    sigma_values = sigma_values.reshape(-1).astype(jnp.float32)
    target_values = target_values.reshape(-1).astype(jnp.float32)
    n = mean_values.shape[0]

    alphas = (jnp.arange(NUM_ALPHAS, dtype=jnp.float32) + 1.0) / 100.0
    z = jnorm.ppf(1.0 - alphas / 2.0)  # (99,)

    abs_resid = jnp.abs(target_values - mean_values)
    # Standardized residual; sigma == 0 covers the target iff resid == 0.
    standardized = jnp.where(
        sigma_values > 0.0,
        abs_resid / jnp.maximum(sigma_values, 1e-38),
        jnp.where(abs_resid == 0.0, 0.0, jnp.inf),
    )
    if mask is None:
        n_valid = jnp.float32(n)
        sigma_mean = jnp.mean(sigma_values)
    else:
        mask = mask.reshape(-1)
        n_valid = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
        standardized = jnp.where(mask, standardized, jnp.inf)
        sigma_mean = jnp.sum(jnp.where(mask, sigma_values, 0.0)) / n_valid
    sorted_std = jnp.sort(standardized)
    # coverage(alpha) = #{ standardized <= z_alpha } / n  (interval closed).
    counts = jnp.searchsorted(sorted_std, z, side="right")
    coverage = counts.astype(jnp.float32) / n_valid

    avg_length = 2.0 * z * sigma_mean

    coverage_error = coverage - (1.0 - alphas)
    abs_coverage_error = jnp.abs(coverage_error)
    neg_coverage_error = (jnp.abs(coverage_error) - coverage_error) / 2.0

    return {
        "coverage_values": coverage,
        "avg_length_values": avg_length,
        "coverage_error_values": coverage_error,
        "abs_coverage_error_values": abs_coverage_error,
        "neg_coverage_error_values": neg_coverage_error,
        "auc_abs_error_values": jnp.trapezoid(abs_coverage_error, alphas),
        "auc_length_values": jnp.trapezoid(avg_length, alphas),
        "auc_neg_error_values": jnp.trapezoid(neg_coverage_error, alphas),
    }
