"""MC-dropout inference: vmapped stochastic forwards.

Replaces the reference's Python loop of full-image renders with dropout
re-enabled (`/root/reference/nerfuncertainty/models/mcdropout/
mcdropout_models.py:94-131`): here the ``mc_samples`` axis is a ``vmap``
over dropout PRNG keys, so all stochastic forwards for a ray chunk compile
into ONE launch (the MC axis batches straight into the MXU matmuls).

Output semantics match the reference: per-key mean over samples, plus
``{rgb,depth,expected_depth}_std`` = per-pixel std across samples, averaged
over channels (`mcdropout_models.py:114-126`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle

_MC_KEYS = ("rgb", "depth", "expected_depth")


def mc_dropout_render(
    model: NerfactoModel,
    params,
    ray_bundle: RayBundle,
    mc_samples: int,
    key: jax.Array,
    use_average_appearance: bool = True,
) -> dict[str, jax.Array]:
    """Mean + std over ``mc_samples`` dropout-perturbed forwards.

    Returns the averaged model outputs plus ``*_std`` entries.
    """

    def one_sample(k):
        return model.apply(
            {"params": params},
            ray_bundle,
            train=False,
            deterministic_dropout=False,
            use_average_appearance=use_average_appearance,
            rngs={"dropout": k},
        )

    keys = jax.random.split(key, mc_samples)
    stacked = jax.vmap(one_sample)(keys)  # dict of (M, ...) arrays

    outputs: dict[str, jax.Array] = {}
    for k, v in stacked.items():
        outputs[k] = jnp.mean(v, axis=0)
    for k in _MC_KEYS:
        if k in stacked:
            std = jnp.std(stacked[k], axis=0, ddof=1)
            if std.ndim > 1 and std.shape[-1] > 1:
                std = jnp.mean(std, axis=-1)
            outputs[k + "_std"] = std
            outputs[k + "_var"] = std**2
    return outputs
