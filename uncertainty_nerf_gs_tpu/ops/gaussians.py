"""3D Gaussian geometry: quaternion rotations, covariances, EWA projection.

TPU-native equivalent of gsplat 0.1.11's CUDA ``project_gaussians``
(consumed by the reference at `/root/reference/nerfuncertainty/models/
activesplatfacto/activesplatfacto_model.py:13,221-234`) and the reference
Python impl ``_torch_impl.quat_to_rotmat`` (`:12,113`). Projection is
embarrassingly parallel per Gaussian, so plain vectorized JAX maps cleanly
onto the VPU; no Pallas needed here. All shapes static: the Gaussian set is
a fixed-capacity buffer with an ``alive`` mask (SURVEY §7 stage 5).

Conventions (matching gsplat):
  * quats are (w, x, y, z), not necessarily normalized;
  * scales are linear (callers exponentiate stored log-scales);
  * viewmat is world->camera (R|t), OpenCV convention (+z forward);
  * 2D covariance gets the +0.3 px low-pass dilation with the matching
    density "compensation" factor sqrt(det(Σ)/det(Σ+0.3I)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotation matrices."""
    # sqrt(sum+eps) instead of norm: zero-padded (dead-slot) quats must have
    # finite gradients (d||q||/dq is NaN at q=0)
    q = quats * jax.lax.rsqrt(
        jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-12
    )
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)], -1),
        ],
        axis=-2,
    )


def scale_rot_to_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Σ = (R S)(R S)^T from (N, 3) linear scales and (N, 4) quats."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


class Projection(NamedTuple):
    """Per-Gaussian screen-space quantities (all leading dim N)."""

    means2d: jax.Array  # (N, 2) pixel coords
    depths: jax.Array  # (N,) camera-space z
    conics: jax.Array  # (N, 3) upper-tri inverse 2D cov (a, b, c): [[a,b],[b,c]]^-1 entries
    radii: jax.Array  # (N,) float 3-sigma pixel radius (0 for culled)
    compensation: jax.Array  # (N,) density compensation from cov dilation
    valid: jax.Array  # (N,) bool — in front of camera & finite footprint


def project_gaussians(
    means: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    viewmat: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    near: float = 0.01,
    eps2d: float = 0.3,
) -> Projection:
    """EWA-project (N,) Gaussians into one camera.

    viewmat: (4, 4) world->camera. Returns screen means, depths, conics,
    radii, compensation, valid — the same surface as gsplat's
    ``project_gaussians`` (activesplatfacto_model.py:221-234) minus the
    tile-count bookkeeping (our rasterizer derives tiles itself).
    """
    R_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]
    p_cam = means @ R_wc.T + t_wc  # (N, 3)
    z = p_cam[..., 2]
    in_front = z > near
    zs = jnp.maximum(z, near)  # safe z for culled points

    # perspective projection to pixels
    x_ndc = p_cam[..., 0] / zs
    y_ndc = p_cam[..., 1] / zs
    # gsplat clips the Jacobian footprint at 1.3 * tan(fov/2)
    tan_x = 0.5 * width / fx
    tan_y = 0.5 * height / fy
    tx = jnp.clip(x_ndc, -1.3 * tan_x, 1.3 * tan_x)
    ty = jnp.clip(y_ndc, -1.3 * tan_y, 1.3 * tan_y)
    means2d = jnp.stack([fx * x_ndc + cx, fy * y_ndc + cy], axis=-1)

    cov3d = scale_rot_to_cov3d(scales, quats)  # (N, 3, 3)
    cov_cam = R_wc[None] @ cov3d @ R_wc.T[None]

    # Jacobian of pixel coords wrt camera coords at the clipped point
    zero = jnp.zeros_like(zs)
    J = jnp.stack(
        [
            jnp.stack([fx / zs, zero, -fx * tx / zs], -1),
            jnp.stack([zero, fy / zs, -fy * ty / zs], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    cov2d = J @ cov_cam @ jnp.swapaxes(J, -1, -2)  # (N, 2, 2)

    det_orig = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    cov2d = cov2d + eps2d * jnp.eye(2)
    det = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    det_safe = jnp.maximum(det, 1e-12)
    # Safe sqrt via double-where: a collapsed Gaussian (scales underflow ->
    # det_orig <= 0 in f32) must yield compensation 0 with ZERO gradient.
    # The naive sqrt(maximum(ratio, 0)) backward is ct * inf at ratio <= 0
    # -> NaN grads to means/scales/quats/opacities (but not features_dc:
    # exactly the poisoned-slot signature of the r3 8k splat soak, where
    # 11.7k immortal NaN slots saturated capacity — NaN compares False so
    # they were never culled).
    ratio = det_orig / det_safe
    ratio_ok = ratio > 1e-6
    compensation = jnp.where(
        ratio_ok, jnp.sqrt(jnp.where(ratio_ok, ratio, 1.0)), 0.0
    )

    inv_det = 1.0 / det_safe
    conics = jnp.stack(
        [
            cov2d[..., 1, 1] * inv_det,
            -cov2d[..., 0, 1] * inv_det,
            cov2d[..., 0, 0] * inv_det,
        ],
        axis=-1,
    )

    # 3-sigma radius from the larger eigenvalue of cov2d
    mid = 0.5 * (cov2d[..., 0, 0] + cov2d[..., 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid**2 - det, 0.01))
    radii = 3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))

    valid = in_front & (det > 0.0) & (radii > 0.0)
    # cull gaussians fully outside the image
    inside = (
        (means2d[..., 0] + radii > 0)
        & (means2d[..., 0] - radii < width)
        & (means2d[..., 1] + radii > 0)
        & (means2d[..., 1] - radii < height)
    )
    valid = valid & inside
    radii = jnp.where(valid, radii, 0.0)
    return Projection(
        means2d=means2d,
        depths=z,
        conics=conics,
        radii=radii,
        compensation=compensation,
        valid=valid,
    )
