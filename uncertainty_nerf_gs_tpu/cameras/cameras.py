"""Cameras and ray generation.

TPU-native counterpart of nerfstudio's ``Cameras.generate_rays`` that the
reference rides through its datamanagers (SURVEY §1 L5). Cameras are a
pytree-of-arrays batch (one entry per image) so ray generation jits and
vmaps; pixel->ray math follows the OpenGL convention used by Blender/
nerfstudio `transforms.json` (x right, y up, camera looks along -z).

Supported camera models: perspective (optional radial/tangential distortion
via iterative undistortion), fisheye (equidistant).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.cameras.lie import compose_poses, exp_map_SE3, exp_map_SO3xR3
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle

PERSPECTIVE = 0
FISHEYE = 1


@flax.struct.dataclass
class Cameras:
    """Batched cameras: leading axis = image index. ``width``/``height``/
    ``camera_type`` are static (pytree aux data) so cameras pass through jit
    boundaries without tracing them."""

    camera_to_worlds: jax.Array  # (N, 3, 4) OpenGL c2w
    fx: jax.Array  # (N,)
    fy: jax.Array  # (N,)
    cx: jax.Array  # (N,)
    cy: jax.Array  # (N,)
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)
    distortion_params: jax.Array | None = None  # (N, 6) k1..k4, p1, p2
    camera_type: int = flax.struct.field(pytree_node=False, default=PERSPECTIVE)

    def __len__(self):
        return self.camera_to_worlds.shape[0]


def _radial_tangential_undistort(
    x: jax.Array, y: jax.Array, d: jax.Array, iters: int = 3
) -> tuple[jax.Array, jax.Array]:
    """Iteratively invert the Brown-Conrady distortion (k1,k2,k3,k4,p1,p2)."""
    k1, k2, k3, k4, p1, p2 = (d[..., i] for i in range(6))
    xu, yu = x, y
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        dy = p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        xu = (x - dx) / radial
        yu = (y - dy) / radial
    return xu, yu


def generate_rays(
    cameras: Cameras,
    camera_indices: jax.Array,
    pixel_x: jax.Array,
    pixel_y: jax.Array,
    pose_adjustment: jax.Array | None = None,
    pose_adjustment_mode: str = "SO3xR3",
) -> RayBundle:
    """Rays through pixel centers.

    Args:
      cameras: batched cameras.
      camera_indices: (R,) int image index per ray.
      pixel_x/pixel_y: (R,) pixel coordinates (column/row).
      pose_adjustment: optional (N, 6) camera-optimizer tangents applied to
        the per-image pose (nerfstudio CameraOptimizer SO3xR3 semantics).

    Returns:
      RayBundle with unit directions; nears/fars filled with 0/1e10
      placeholders (models override with their near/far planes).
    """
    c2w = cameras.camera_to_worlds[camera_indices]  # (R, 3, 4)
    if pose_adjustment is not None:
        tangent = pose_adjustment[camera_indices]
        if pose_adjustment_mode == "SO3xR3":
            delta = exp_map_SO3xR3(tangent)
        else:
            delta = exp_map_SE3(tangent)
        c2w = compose_poses(delta, c2w)

    fx = cameras.fx[camera_indices]
    fy = cameras.fy[camera_indices]
    cx = cameras.cx[camera_indices]
    cy = cameras.cy[camera_indices]

    # pixel center offset +0.5
    u = (pixel_x.astype(jnp.float32) + 0.5 - cx) / fx
    v = (pixel_y.astype(jnp.float32) + 0.5 - cy) / fy

    if cameras.distortion_params is not None:
        d = cameras.distortion_params[camera_indices]
        u, v = _radial_tangential_undistort(u, v, d)

    if cameras.camera_type == FISHEYE:
        theta = jnp.sqrt(u * u + v * v)
        theta = jnp.clip(theta, 1e-9, None)
        sin_over_theta = jnp.sin(theta) / theta
        dirs_cam = jnp.stack(
            [u * sin_over_theta, -v * sin_over_theta, -jnp.cos(theta)], axis=-1
        )
    else:
        # OpenGL: +x right, +y up, looking down -z; image y grows downward
        dirs_cam = jnp.stack([u, -v, -jnp.ones_like(u)], axis=-1)

    dirs_world = jnp.einsum("rij,rj->ri", c2w[..., :3, :3], dirs_cam)
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = c2w[..., :3, 3]

    return RayBundle(
        origins=origins,
        directions=dirs_world,
        nears=jnp.zeros_like(u),
        fars=jnp.full_like(u, 1e10),
        camera_indices=camera_indices.astype(jnp.int32),
    )


def pixel_grid(height: int, width: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image pixel coordinate grid, flattened row-major: (H*W,) x, y."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return xs.reshape(-1), ys.reshape(-1)
