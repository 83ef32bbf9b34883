"""Ray sampling: spaced (uniform) samplers and PDF resampling.

TPU-native equivalent of nerfstudio's ``UniformLinDispPiecewiseSampler`` /
``PDFSampler`` / ``ProposalNetworkSampler`` machinery the reference consumes
(`/root/reference/nerfuncertainty/models/laplace/laplace_model.py`
proposal_sampler usage; train batches at `laplace_config.py:31-32`).

All samplers operate in a normalized "spacing" domain s in [0, 1]; the
piecewise spacing function is linear up to the scene midpoint and 1/x beyond
(good near/far allocation for unbounded scenes). Everything has static
shapes so the two-stage proposal hierarchy jits into one XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.ops.backend import on_tpu
from uncertainty_nerf_gs_tpu.ops.prefix import cumsum_lanes


class RayBundle(NamedTuple):
    origins: jax.Array  # (R, 3)
    directions: jax.Array  # (R, 3) unit
    nears: jax.Array  # (R,)
    fars: jax.Array  # (R,)
    camera_indices: jax.Array  # (R,) int32


class RaySamples(NamedTuple):
    origins: jax.Array  # (R, 3)
    directions: jax.Array  # (R, 3)
    starts: jax.Array  # (R, S) euclidean bin starts
    ends: jax.Array  # (R, S) euclidean bin ends
    spacing_edges: jax.Array  # (R, S+1) normalized s-space edges
    camera_indices: jax.Array  # (R,)

    @property
    def deltas(self) -> jax.Array:
        return self.ends - self.starts

    @property
    def midpoints(self) -> jax.Array:
        return 0.5 * (self.starts + self.ends)

    @property
    def positions(self) -> jax.Array:
        return (
            self.origins[..., None, :]
            + self.directions[..., None, :] * self.midpoints[..., None]
        )


# -- spacing functions -------------------------------------------------------


def spacing_piecewise(x: jax.Array) -> jax.Array:
    """t -> s: linear for t<1, 1 - 1/(2t) beyond (UniformLinDispPiecewise)."""
    return jnp.where(x < 1.0, x / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(x, 1e-9)))


def spacing_piecewise_inv(x: jax.Array) -> jax.Array:
    return jnp.where(x < 0.5, 2.0 * x, 1.0 / jnp.maximum(2.0 - 2.0 * x, 1e-9))


def spacing_uniform(x: jax.Array) -> jax.Array:
    return x


def spacing_uniform_inv(x: jax.Array) -> jax.Array:
    return x


def _edges_to_samples(
    ray_bundle: RayBundle,
    s_edges: jax.Array,
    spacing_fn: Callable,
    spacing_fn_inv: Callable,
) -> RaySamples:
    s_near = spacing_fn(ray_bundle.nears)[..., None]
    s_far = spacing_fn(ray_bundle.fars)[..., None]
    t_edges = spacing_fn_inv(s_edges * (s_far - s_near) + s_near)
    return RaySamples(
        origins=ray_bundle.origins,
        directions=ray_bundle.directions,
        starts=t_edges[..., :-1],
        ends=t_edges[..., 1:],
        spacing_edges=s_edges,
        camera_indices=ray_bundle.camera_indices,
    )


def sample_uniform(
    ray_bundle: RayBundle,
    num_samples: int,
    key: jax.Array | None = None,
    spacing_fn: Callable = spacing_piecewise,
    spacing_fn_inv: Callable = spacing_piecewise_inv,
) -> RaySamples:
    """Stratified (train, key given) or centered (eval) spaced sampling."""
    num_rays = ray_bundle.origins.shape[0]
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)
    edges = jnp.broadcast_to(edges, (num_rays, num_samples + 1))
    if key is not None:
        # jitter interior edges within their bins (stratified, bins stay sorted)
        bin_w = 1.0 / num_samples
        jitter = jax.random.uniform(
            key, (num_rays, num_samples + 1), minval=-0.5, maxval=0.5
        ) * bin_w
        jitter = jitter.at[:, 0].set(jnp.clip(jitter[:, 0], 0.0, None))
        jitter = jitter.at[:, -1].set(jnp.clip(jitter[:, -1], None, 0.0))
        edges = edges + jitter
    return _edges_to_samples(ray_bundle, edges, spacing_fn, spacing_fn_inv)


# lane-axis cumsum lowers poorly on TPU (sequential shift chain); the MXU
# blocked-triangular-matmul prefix sum replaces it — measured as a dominant
# cost of the PDF resampler at (32k rays, 256 bins)
_cumsum_last = cumsum_lanes


def sample_pdf(
    ray_bundle: RayBundle,
    s_edges: jax.Array,
    weights: jax.Array,
    num_samples: int,
    key: jax.Array | None = None,
    histogram_padding: float = 0.01,
    spacing_fn: Callable = spacing_piecewise,
    spacing_fn_inv: Callable = spacing_piecewise_inv,
    eps: float = 1e-5,
) -> RaySamples:
    """Importance-resample new bin edges from a weights histogram.

    s_edges: (R, S+1) existing normalized edges; weights: (R, S).
    Matches nerfstudio PDFSampler semantics: per-bin padding, stratified u
    during training, evenly spaced u at eval.
    """
    num_rays, num_bins = weights.shape

    n_new = num_samples + 1  # sample new edges
    if key is not None:
        u = (
            jnp.arange(n_new, dtype=jnp.float32)[None, :]
            + jax.random.uniform(key, (num_rays, n_new))
        ) / n_new
    else:
        u = (jnp.arange(n_new, dtype=jnp.float32)[None, :] + 0.5) / n_new
        u = jnp.broadcast_to(u, (num_rays, n_new))
    u = jnp.clip(u, 0.0, 1.0 - 1e-6)

    # On TPU the WHOLE resampler (histogram padding -> CDF on the MXU ->
    # bracket -> interpolate) is one fused Pallas kernel
    # (ops/pdf_pallas.py::resample_edges_tpu): the staged version's HBM
    # roundtrips between cumsum / inversion / merge made the PDF chain
    # ~185 ms of a 543 ms fused ensemble render (r3 ablation). Elsewhere
    # (CPU tests), a fused compare-reduce replaces the vmapped
    # searchsorted (which was itself ~45% of the round-1 render); reducing
    # over the MIDDLE axis (bins in sublanes) measures 3.2x faster than a
    # lane-major bin axis. Gradients never flow through the sampler in the
    # nerfacto training path (weights are stop-gradient'ed), and the Pallas
    # path stops them explicitly.
    # pltpu kernels lower only on TPU backends; GPU/other accelerators take
    # the XLA path (ADVICE r2; dispatch helper: ops/backend.py).
    if on_tpu():
        from uncertainty_nerf_gs_tpu.ops.pdf_pallas import resample_edges_tpu

        new_edges = resample_edges_tpu(
            weights, s_edges, u, histogram_padding, eps
        )
    else:
        weights = weights + histogram_padding
        w_sum = jnp.sum(weights, axis=-1, keepdims=True)
        padding = jnp.clip(eps - w_sum, 0.0, None)
        weights = weights + padding / num_bins
        w_sum = w_sum + padding

        pdf = weights / w_sum
        cdf = jnp.concatenate(
            [jnp.zeros((num_rays, 1)), _cumsum_last(pdf)], axis=-1
        )
        cdf = jnp.clip(cdf, 0.0, 1.0)

        idx = jnp.sum(
            (cdf[:, :, None] <= u[:, None, :]).astype(jnp.int32), axis=1
        ) - 1
        idx = jnp.clip(idx, 0, num_bins - 1)
        c0 = jnp.take_along_axis(cdf, idx, axis=-1)
        c1 = jnp.take_along_axis(cdf, idx + 1, axis=-1)
        e0 = jnp.take_along_axis(s_edges, idx, axis=-1)
        e1 = jnp.take_along_axis(s_edges, idx + 1, axis=-1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        new_edges = e0 + frac * (e1 - e0)
    # u ascending + cdf monotone => new_edges already non-decreasing; the
    # defensive sort the searchsorted path carried is unnecessary.
    return _edges_to_samples(ray_bundle, new_edges, spacing_fn, spacing_fn_inv)
