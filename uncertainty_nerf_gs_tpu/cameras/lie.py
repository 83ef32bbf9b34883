"""Lie-group exponential maps for camera pose optimization.

TPU-native equivalents of nerfstudio's ``lie_groups.exp_map_SO3xR3`` /
``exp_map_SE3`` consumed by the reference's camera optimizer
(`laplace_config.py:37` mode="SO3xR3") and pose-gradient script
(`/root/reference/nerfuncertainty/scripts/estimate_gradient_pose_6dof.py:
118-126`). Tangent vectors are (..., 6) = [translation (3), rotation (3)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _skew(v: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _safe_theta(omega: jax.Array, eps_sq: float):
    """(theta_sq, theta, safe) with NaN-free gradients at omega = 0.

    ``jnp.linalg.norm`` has a NaN gradient at zero and `jnp.where` does NOT
    block cotangents of the unselected branch — the dummy value inside the
    sqrt makes d theta / d theta_sq zero on the Taylor branch instead.
    """
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)[..., None]
    safe = theta_sq > eps_sq
    theta = jnp.sqrt(jnp.where(safe, theta_sq, 1.0))
    return theta_sq, theta, safe


def exp_map_SO3(omega: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues formula: (..., 3) tangent -> (..., 3, 3) rotation."""
    k = _skew(omega)
    theta_sq, theta, safe = _safe_theta(omega, eps * eps)
    # Taylor-safe coefficients (grads finite on both branches)
    a = jnp.where(safe, jnp.sin(theta) / theta, 1.0 - theta_sq / 6.0)
    b = jnp.where(
        safe,
        (1.0 - jnp.cos(theta)) / jnp.where(safe, theta_sq, 1.0),
        0.5 - theta_sq / 24.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    return eye + a * k + b * (k @ k)


def exp_map_SO3xR3(tangent: jax.Array) -> jax.Array:
    """Decoupled rotation+translation: (..., 6) -> (..., 3, 4)."""
    t = tangent[..., :3]
    rot = exp_map_SO3(tangent[..., 3:])
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Full SE(3) exponential: (..., 6) -> (..., 3, 4) with V-coupled
    translation."""
    rho = tangent[..., :3]
    omega = tangent[..., 3:]
    rot = exp_map_SO3(omega)
    k = _skew(omega)
    theta_sq, theta, safe = _safe_theta(omega, eps * eps)
    safe_sq = jnp.where(safe, theta_sq, 1.0)
    b = jnp.where(
        safe,
        (1.0 - jnp.cos(theta)) / safe_sq,
        0.5 - theta_sq / 24.0,
    )
    c = jnp.where(
        safe,
        (theta - jnp.sin(theta)) / (safe_sq * theta),
        1.0 / 6.0 - theta_sq / 120.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    v = eye + b * k + c * (k @ k)
    t = (v @ rho[..., None])[..., 0]
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def compose_poses(delta: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply a (..., 3, 4) correction to a (..., 3, 4) camera-to-world."""
    r = delta[..., :3, :3] @ pose[..., :3, :3]
    t = (delta[..., :3, :3] @ pose[..., :3, 3:])[..., 0] + delta[..., :3, 3]
    return jnp.concatenate([r, t[..., None]], axis=-1)
