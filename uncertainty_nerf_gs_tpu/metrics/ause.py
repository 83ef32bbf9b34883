"""Area Under the Sparsification Error curve (AUSE).

Semantics match the reference implementation
(`/root/reference/nerfuncertainty/metrics/ause.py:7-44`, itself from CF-NeRF):

  * 100 removal ratios ``linspace(0, 1, 100, endpoint=False)``;
  * the "oracle" curve keeps the ``int((1-r)*n)`` smallest errors sorted by
    the error itself, the "by-variance" curve keeps the same count sorted by
    predicted uncertainty (ascending);
  * per-ratio statistic is the mean (``mae``/``mse``) or the sqrt of the mean
    (``rmse``) of the kept errors;
  * both curves are normalized by their joint maximum;
  * AUSE = trapezoid integral of (by-variance - oracle) over the ratios.

The reference loops over the 100 ratios in Python with per-slice ``.mean()``
(an O(100·n) host loop); here each curve is one sort + one cumulative sum,
fully vectorized and jittable on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NUM_RATIOS = 100


@functools.partial(jax.jit, static_argnames=("err_type",))
def ause(
    unc_vec: jax.Array,
    err_vec: jax.Array,
    err_type: str = "rmse",
    mask: jax.Array | None = None,
):
    """Sparsification-error metric.

    Args:
      unc_vec: (n,) predicted uncertainty per pixel (any monotone score).
      err_vec: (n,) true error per pixel (e.g. mae/mse values).
      err_type: "rmse" applies sqrt to the mean of kept mse values;
        "mae"/"mse" use the mean directly.
      mask: optional (n,) bool; when given, the metric equals `ause` on the
        masked SUBSET exactly, computed under static shapes: masked-out
        entries sort to the tail (+inf key) and the keep counts index a
        prefix of the valid region only — no host boolean indexing
        (depth metrics mask `depth_gt > 0`, reference
        `eval_uncertainty.py:556-560`).

    Returns:
      (ratio_removed, oracle_curve, by_var_curve, ause_value) with curves of
      length 100, matching the reference's return signature.
    """
    if err_type not in ("rmse", "mae", "mse"):
        raise ValueError(f"unknown err_type {err_type!r}")
    unc_vec = unc_vec.reshape(-1).astype(jnp.float32)
    err_vec = err_vec.reshape(-1).astype(jnp.float32)
    n = err_vec.shape[0]
    if mask is None:
        n_valid = jnp.int32(n)
        to_tail = None
    else:
        mask = mask.reshape(-1)
        n_valid = jnp.sum(mask).astype(jnp.int32)
        to_tail = jnp.where(mask, 0.0, jnp.inf)

    ratio_removed = jnp.linspace(0.0, 1.0, NUM_RATIOS, endpoint=False)
    # int((1 - r) * n_valid) with float32 rounding semantics of the
    # reference; clamp to >=1 so tiny inputs don't produce empty slices.
    keep_counts = jnp.clip(
        ((1.0 - ratio_removed) * n_valid).astype(jnp.int32), 1, n_valid
    )

    def curve(order_key: jax.Array) -> jax.Array:
        if to_tail is not None:
            order_key = order_key + to_tail  # invalid entries sort last
        order = jnp.argsort(order_key)
        errs = err_vec[order]
        prefix_mean = jnp.cumsum(errs) / jnp.arange(1, n + 1, dtype=jnp.float32)
        vals = prefix_mean[keep_counts - 1]
        if err_type == "rmse":
            vals = jnp.sqrt(vals)
        return vals

    oracle = curve(err_vec)
    by_var = curve(unc_vec)

    max_val = jnp.maximum(jnp.max(oracle), jnp.max(by_var))
    oracle = oracle / max_val
    by_var = by_var / max_val
    value = jnp.trapezoid(by_var - oracle, ratio_removed)
    return ratio_removed, oracle, by_var, value
