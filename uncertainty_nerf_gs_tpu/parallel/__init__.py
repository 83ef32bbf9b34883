"""Parallelism: device mesh, sharded data-parallel + ensemble-member axes."""

from uncertainty_nerf_gs_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = ["make_mesh", "shard_batch", "replicate"]
