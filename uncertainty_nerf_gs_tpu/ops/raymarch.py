"""Volumetric ray-march compositing: weights, renderers, and regularizers.

TPU-native equivalents of the nerfstudio machinery the reference consumes
(`RaySamples.get_weights`, `RGBRenderer`, `DepthRenderer`,
`AccumulationRenderer`, `UncertaintyRenderer` — see `/root/reference/
nerfuncertainty/models/activenerfacto/activenerfacto_model.py:27,104-112` and
`laplace/laplace_model.py:30,478-514`), plus the Mip-NeRF 360 interlevel and
distortion losses used by the nerfacto family. Everything is shape-static,
O(S) per ray via cumulative sums, and jit/vmap-friendly.

Shapes: R rays, S samples per ray. ``starts``/``ends`` are euclidean bin
edges along the ray, ``weights`` are compositing weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.ops.prefix import cumsum_lanes


def render_weights(densities: jax.Array, deltas: jax.Array) -> jax.Array:
    """Compositing weights w_i = alpha_i * T_i from densities.

    Closed form the reference re-derives for its Laplace GGN modules
    (`laplace_model.py:48-62`): alpha = 1 - exp(-sigma*delta),
    T_i = exp(-sum_{j<i} sigma_j delta_j).

    Args:
      densities: (R, S) non-negative densities.
      deltas: (R, S) bin lengths.

    Returns:
      (R, S) weights.
    """
    tau = densities * deltas
    alphas = 1.0 - jnp.exp(-tau)
    # exclusive cumulative sum of optical depth. Lane-axis jnp.cumsum
    # lowers on TPU as a sequential per-bin shift chain — at the proposal
    # stage's (32k rays, 256 bins) that is 256 full-array passes; the
    # MXU-blocked prefix (ops/prefix.py) is one triangular matmul and its
    # VJP is another, so training gradients ride the MXU too.
    accum = cumsum_lanes(tau)
    trans = jnp.exp(-(accum - tau))
    return alphas * trans


def render_rgb(
    weights: jax.Array, rgbs: jax.Array, background: jax.Array | None = None
) -> jax.Array:
    """(R, S) weights x (R, S, 3) rgbs -> (R, 3); optional background comp."""
    comp = jnp.sum(weights[..., None] * rgbs, axis=-2)
    if background is not None:
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        comp = comp + (1.0 - acc) * background
    return comp


def render_accumulation(weights: jax.Array) -> jax.Array:
    return jnp.sum(weights, axis=-1)


def render_expected_depth(
    weights: jax.Array, steps: jax.Array, eps: float = 1e-10
) -> jax.Array:
    """Accumulation-normalized expected termination depth (R,)."""
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * steps, axis=-1) / (acc + eps)
    lo = jnp.min(steps, axis=-1)
    hi = jnp.max(steps, axis=-1)
    return jnp.clip(depth, lo, hi)


def render_median_depth(weights: jax.Array, steps: jax.Array) -> jax.Array:
    """Depth where cumulative weight first reaches 0.5 (R,)."""
    cum = cumsum_lanes(weights)
    split = jnp.full(weights.shape[:-1] + (1,), 0.5, weights.dtype)
    idx = jax.vmap(lambda c, s: jnp.searchsorted(c, s, side="left"))(
        cum.reshape(-1, cum.shape[-1]), split.reshape(-1, 1)
    ).reshape(weights.shape[:-1])
    idx = jnp.clip(idx, 0, steps.shape[-1] - 1)
    return jnp.take_along_axis(steps, idx[..., None], axis=-1)[..., 0]


def render_uncertainty(betas: jax.Array, weights: jax.Array) -> jax.Array:
    """UncertaintyRenderer semantics: sum(weights * betas) over samples.

    Callers pass ``weights**2`` to propagate variances
    (`activenerfacto_model.py:104-107`, `laplace_model.py:478-480`).
    """
    return jnp.sum(betas * weights, axis=-1)


def depth_variance(
    weights: jax.Array, steps: jax.Array, depth: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Analytic depth variance sum_i w_i (t_i - d)^2 + eps
    (`activenerfacto_model.py:111-112`, `laplace_model.py:513-514`)."""
    return jnp.sum(weights * (steps - depth[..., None]) ** 2, axis=-1) + eps


# ---------------------------------------------------------------------------
# Mip-NeRF 360 regularizers (nerfacto's interlevel + distortion losses).
# ---------------------------------------------------------------------------


def _outer_measure(
    t0: jax.Array, w0: jax.Array, t1: jax.Array, w1: jax.Array
) -> jax.Array:
    """For each interval in t0, the total w1 mass of overlapping t1 bins.

    t0: (R, S0+1) query bin edges; w0 unused except shape; t1: (R, S1+1)
    envelope bin edges; w1: (R, S1) envelope weights. Returns (R, S0).
    """
    cw1 = jnp.concatenate(
        [jnp.zeros_like(w1[..., :1]), cumsum_lanes(w1)], axis=-1
    )  # (R, S1+1)

    def per_ray(t0r, t1r, cw1r):
        idx_lo = jnp.clip(jnp.searchsorted(t1r, t0r[:-1], side="right") - 1, 0, None)
        idx_hi = jnp.searchsorted(t1r, t0r[1:], side="left")
        idx_lo = jnp.clip(idx_lo, 0, cw1r.shape[-1] - 1)
        idx_hi = jnp.clip(idx_hi, 0, cw1r.shape[-1] - 1)
        return cw1r[idx_hi] - cw1r[idx_lo]

    return jax.vmap(per_ray)(t0, t1, cw1)


def interlevel_loss(
    final_sdist: jax.Array,
    final_weights: jax.Array,
    prop_sdists: list[jax.Array],
    prop_weights: list[jax.Array],
    eps: float = 1e-7,
) -> jax.Array:
    """Proposal (interlevel) loss: penalize final weight mass the proposal
    envelope fails to cover. All distances in normalized s-space.

    final_sdist: (R, S+1); final_weights: (R, S) — stop-gradient applied here.
    """
    c = jax.lax.stop_gradient(final_sdist)
    w = jax.lax.stop_gradient(final_weights)
    total = 0.0
    for cp, wp in zip(prop_sdists, prop_weights):
        w_outer = _outer_measure(c, w, cp, wp)
        excess = jnp.clip(w - w_outer, 0.0, None)
        total = total + jnp.mean(excess**2 / (w + eps))
    return total


def distortion_loss(sdist: jax.Array, weights: jax.Array) -> jax.Array:
    """Mip-NeRF 360 distortion loss in s-space, O(S) via cumsums.

    sdist: (R, S+1) normalized bin edges; weights: (R, S).
    """
    mids = 0.5 * (sdist[..., 1:] + sdist[..., :-1])
    deltas = sdist[..., 1:] - sdist[..., :-1]
    # pairwise term: 2 * sum_i w_i * (m_i * csum_{j<i} w_j - csum_{j<i} w_j m_j)
    cw = cumsum_lanes(weights)
    cwm = cumsum_lanes(weights * mids)
    cw_ex = cw - weights
    cwm_ex = cwm - weights * mids
    pairwise = 2.0 * jnp.sum(weights * (mids * cw_ex - cwm_ex), axis=-1)
    self_term = jnp.sum(weights**2 * deltas, axis=-1) / 3.0
    return jnp.mean(pairwise + self_term)
