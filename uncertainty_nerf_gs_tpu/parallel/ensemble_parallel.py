"""Sharded ensemble training and rendering over the ("data", "member") mesh.

Replaces the reference's M sequential `ns-train` runs + per-member eval
loops (`README.md:107-111`, `ensemble_pipeline.py:155-157`): member params
are stacked on a leading axis sharded over mesh axis "member", train-batch
rays shard over "data", and one jitted step trains ALL members at once
(each member gets an independent PRNG stream, reproducing the
independent-seed semantics).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras, generate_rays
from uncertainty_nerf_gs_tpu.models.ensemble import combine_ensemble_outputs
from uncertainty_nerf_gs_tpu.models.nerfacto import (
    NerfactoConfig,
    NerfactoModel,
    nerfacto_loss,
    proposal_anneal_factor,
)


def init_ensemble_params(
    model: NerfactoModel, num_members: int, base_seed: int = 0
) -> Any:
    """Independently seeded member params stacked on a leading axis."""
    from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle

    dummy_rb = RayBundle(
        origins=jnp.zeros((4, 3)),
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1)),
        nears=jnp.zeros((4,)),
        fars=jnp.ones((4,)),
        camera_indices=jnp.zeros((4,), jnp.int32),
    )

    def init_one(key):
        return model.init({"params": key, "dropout": key}, dummy_rb, train=False)[
            "params"
        ]

    keys = jax.random.split(jax.random.PRNGKey(base_seed), num_members)
    return jax.vmap(init_one)(keys)


def build_ensemble_train_step(
    model: NerfactoModel,
    config: NerfactoConfig,
    cameras: Cameras,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
) -> Callable:
    """One jitted step updating every ensemble member.

    Batch pytree: camera_indices/pixel_x/pixel_y/image with leading ray axis
    (sharded over "data" when a mesh is given). Params/opt_state have a
    leading member axis (sharded over "member").
    """

    def member_loss(params, batch, rng, step):
        rb = generate_rays(
            cameras, batch["camera_indices"], batch["pixel_x"], batch["pixel_y"]
        )
        anneal = proposal_anneal_factor(step, config)
        outputs = model.apply(
            {"params": params},
            rb,
            train=True,
            rngs_key=rng,
            proposal_anneal=anneal,
            rngs={"dropout": rng},
        )
        total, _ = nerfacto_loss(outputs, batch, config)
        return total

    def step_fn(stacked_params, opt_state, batch, rng, step):
        member_rngs = jax.random.split(
            jax.random.fold_in(rng, 0), jax.tree.leaves(stacked_params)[0].shape[0]
        )

        def one_member(params, member_rng):
            loss, grads = jax.value_and_grad(member_loss)(params, batch, member_rng, step)
            return loss, grads

        losses, grads = jax.vmap(one_member)(stacked_params, member_rngs)
        updates, new_opt_state = jax.vmap(tx.update)(grads, opt_state, stacked_params)
        new_params = optax.apply_updates(stacked_params, updates)
        return new_params, new_opt_state, losses

    if mesh is None:
        return jax.jit(step_fn)

    member_sharding = NamedSharding(mesh, P("member"))
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(
            member_sharding,
            member_sharding,
            data_sharding,
            repl,
            repl,
        ),
        out_shardings=(member_sharding, member_sharding, member_sharding),
    )


def build_ensemble_render(
    model: NerfactoModel, mesh: Mesh | None = None, parity_mode: bool = True
) -> Callable:
    """Jitted fan-out render: (stacked_params, ray_bundle) -> combined
    mean/variance outputs (the north-star single-launch ensemble render)."""

    def render(stacked_params, ray_bundle):
        def one_member(params):
            return model.apply(
                {"params": params},
                ray_bundle,
                train=False,
                use_average_appearance=True,
            )

        if mesh is None:
            # single device: members execute serially anyway, and lax.map
            # keeps the peak footprint at ONE member's gather intermediates
            # (hash-table row-gathers can't fuse and would materialize a
            # members-x-corners-x-128 buffer under vmap — OOM at 5 members)
            stacked = jax.lax.map(one_member, stacked_params)
        else:
            # member axis sharded over the mesh: each device holds only its
            # member's intermediates, so the batched form is safe
            stacked = jax.vmap(one_member)(stacked_params)
        return combine_ensemble_outputs(stacked, parity_mode=parity_mode)

    if mesh is None:
        return jax.jit(render)
    member_sharding = NamedSharding(mesh, P("member"))
    data_sharding = NamedSharding(mesh, P("data"))
    return jax.jit(
        render,
        in_shardings=(member_sharding, data_sharding),
        out_shardings=NamedSharding(mesh, P()),
    )
