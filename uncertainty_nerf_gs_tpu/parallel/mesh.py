"""Device mesh and sharding helpers.

The reference's entire distributed story is NCCL DDP plumbing in the
ensemble pipeline (`/root/reference/nerfuncertainty/models/ensemble/
ensemble_pipeline.py:63-69`, vestigial) plus sequential member loops. The
TPU-native replacement (SURVEY §2.4) is one 2-D mesh:

  * axis ``"data"``   — shards the ray axis of train batches / render
    chunks; XLA inserts `psum` for loss/grad reductions over ICI.
  * axis ``"member"`` — shards stacked ensemble-member params; members are
    independent so no collective traffic crosses this axis until outputs
    combine.

Everything goes through `jax.jit` with `NamedSharding` annotations — no
hand-written collectives needed for this workload.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int | None = None, num_member: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "member") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_member
    assert num_data * num_member <= n, (
        f"mesh {num_data}x{num_member} needs more than {n} devices"
    )
    arr = np.array(devices[: num_data * num_member]).reshape(num_data, num_member)
    return Mesh(arr, ("data", "member"))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (R, ...) arrays with the ray axis over "data"."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_members(stacked_params, mesh: Mesh):
    """Place stacked member params with the leading axis over "member"."""
    sharding = NamedSharding(mesh, P("member"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked_params)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
