"""Multi-device splat rendering: tile-band sharding over the mesh.

The splat analog of the ray-axis sharding used for the NeRF family
(SURVEY §2.4): a full-image rasterization splits into horizontal bands of
tile rows, one band per device on the ``"data"`` mesh axis. Gaussian
parameters are replicated (they are small — a fixed-capacity buffer), the
per-band rasterization needs **zero cross-device communication** (tiles are
independent), and the image assembles with the all-gather XLA inserts for
the banded output. This is the declarative replacement for gsplat's
single-GPU CUDA launch — the same kernel scales to a v5e-8 slice by
changing only the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uncertainty_nerf_gs_tpu.ops.gaussians import Projection, project_gaussians
from uncertainty_nerf_gs_tpu.ops.rasterize import TILE, rasterize_gaussians


def _band_height(height: int, num_devices: int) -> int:
    rows = (height + TILE - 1) // TILE
    rows_per_dev = (rows + num_devices - 1) // num_devices
    return rows_per_dev * TILE


def rasterize_gaussians_sharded(
    proj: Projection,
    opacities: jax.Array,
    payload: jax.Array,
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "data",
    **raster_kwargs,
):
    """Rasterize with the tile-row axis sharded over ``mesh[axis]``.

    Returns (image (H', W, C), alpha (H', W), max_overflow) where H' is
    height padded to a whole number of bands; callers slice [:height].
    """
    num_devices = mesh.shape[axis]
    band_h = _band_height(height, num_devices)
    total_h = band_h * num_devices

    y_offsets = jnp.arange(num_devices, dtype=jnp.float32)[:, None] * band_h

    def band_fn(y0, p, opac, payl):
        # shift screen-space y so each device rasterizes its own band
        y0 = y0[0, 0]
        local = p._replace(
            means2d=p.means2d - jnp.stack(
                [jnp.zeros_like(p.means2d[:, 0]),
                 jnp.full_like(p.means2d[:, 1], y0)], axis=-1
            )
        )
        out = rasterize_gaussians(local, opac, payl, width, band_h, **raster_kwargs)
        return out.image[None], out.alpha[None], out.max_overflow[None]

    from jax import shard_map

    img, alpha, overflow = shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),  # gaussians replicated
        out_specs=(P(axis, None, None, None), P(axis, None, None), P(axis)),
    )(y_offsets, proj, opacities, payload)
    img = img.reshape(total_h, img.shape[-2], img.shape[-1])[:height]
    alpha = alpha.reshape(total_h, alpha.shape[-1])[:height]
    return img, alpha, jnp.max(overflow)
