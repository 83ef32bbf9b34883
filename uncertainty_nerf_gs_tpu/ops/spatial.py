"""Spatial distortions and box normalization for unbounded scenes.

``scene_contraction`` is the Mip-NeRF 360 contraction with L-inf norm used by
nerfacto (consumed by every reference field through nerfstudio's
``SceneContraction(order=float("inf"))``): points inside the unit ball map to
themselves, outside to ``(2 - 1/|x|) * x/|x|``, so all space lands in
[-2, 2]^3; fields then normalize to [0, 1]^3 for the hash grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scene_contraction(x: jax.Array, order: float = jnp.inf) -> jax.Array:
    if order == jnp.inf:
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-9)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def contract_to_unit_cube(x: jax.Array) -> jax.Array:
    """Contract then map [-2, 2]^3 -> [0, 1]^3 (nerfacto hash-grid input)."""
    return (scene_contraction(x) + 2.0) / 4.0


def normalize_aabb(x: jax.Array, aabb: jax.Array) -> jax.Array:
    """Map points inside an axis-aligned box to [0, 1]^3.

    aabb: (2, 3) [min; max].
    """
    return (x - aabb[0]) / (aabb[1] - aabb[0])
