"""Deep-ensemble rendering: stacked member params, one vmapped launch.

The reference loops its M models per camera (`/root/reference/
nerfuncertainty/models/ensemble/ensemble_pipeline.py:155-157`); here member
params are stacked on a leading axis and the render is a single ``vmap``
(optionally sharded over a mesh "member" axis — see `parallel/`). This is
the BASELINE.json north-star path: a 5-member mean+variance render is one
XLA program.

Combination semantics match `ensemble_pipeline.py:159-190` exactly:

  * every output key -> mean over members;
  * if members carry aleatoric heads (``rgb_std``/``depth_std`` present,
    i.e. active-* members): for rgb/depth,
    ``var = var_epi + var_alea`` with ``var_alea`` = member-mean of the
    predicted variance (channel-averaged) and ``var_epi`` = across-member
    variance of the means (channel-averaged, unbiased as torch's default);
  * else ``*_std`` = unbiased sample std across members, channel-averaged,
    for rgb/depth/expected_depth.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle


def stack_params(param_list) -> dict:
    """Stack M independently trained param pytrees on a leading member axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def _channel_mean(x: jax.Array) -> jax.Array:
    """The reference's ``.mean(dim=-1)`` channel reduction
    (`ensemble_pipeline.py:169-171`) — there every map carries an explicit
    trailing channel axis (3 for rgb, 1 for depth). Here scalar fields may
    already be channel-less (e.g. splat depth/rgb_var are (H, W)), so only
    a trailing axis of size 3 (rgb channels) is averaged and a trailing 1
    is squeezed; anything else is a spatial axis and passes through."""
    if x.ndim > 1 and x.shape[-1] == 3:
        return jnp.mean(x, axis=-1)
    if x.ndim > 1 and x.shape[-1] == 1:
        return x[..., 0]
    return x


def ensemble_render(
    model: NerfactoModel,
    stacked_params,
    ray_bundle: RayBundle,
    use_average_appearance: bool = True,
    member_apply: Callable | None = None,
) -> dict[str, jax.Array]:
    """Ensemble mean + epistemic/aleatoric variance for a ray chunk.

    Args:
      model: shared architecture.
      stacked_params: params with leading member axis (see `stack_params`).
      member_apply: optional override of the per-member forward (e.g. a
        shard_map'ed version over the mesh "member" axis).
    """

    def one_member(params):
        return model.apply(
            {"params": params},
            ray_bundle,
            train=False,
            use_average_appearance=use_average_appearance,
        )

    apply_fn = member_apply or one_member
    stacked = jax.vmap(apply_fn)(stacked_params)  # dict of (M, ...)
    return combine_ensemble_outputs(stacked)


def ensemble_render_splat(
    stacked_params,
    stacked_alive: jax.Array,
    c2w: jax.Array,
    fx, fy, cx, cy,
    width: int,
    height: int,
    config,
    background: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Single-launch splat ensemble render (`ensemble_pipeline.py:210`,
    `EnsemblePipelineSplatfacto` — a per-member Python loop there).

    Member Gaussian sets differ only in WHICH of the ``capacity`` slots are
    alive — capacity is a static shape and ``alive`` is a mask — so member
    params stack on a leading axis and the whole fan-out is one vmapped XLA
    program instead of M separate launches. Combination rule unchanged.
    """
    from uncertainty_nerf_gs_tpu.models.splatfacto import render_splat

    def one_member(params, alive):
        return render_splat(
            params, alive, c2w, fx, fy, cx, cy, width, height, config,
            sh_deg=config.sh_degree, background=background,
        )

    stacked = jax.vmap(one_member)(stacked_params, stacked_alive)
    keys = [
        k for k in stacked
        if k not in ("radii", "visible", "raster_overflow")
    ]
    return combine_ensemble_outputs({k: stacked[k] for k in keys})


def combine_ensemble_outputs(
    stacked: dict[str, jax.Array], parity_mode: bool = True
) -> dict[str, jax.Array]:
    """Reduce a dict of (M, ...) member outputs to mean + uncertainty.

    Parity note: the reference's combination loop (`ensemble_pipeline.py:
    159-190`) writes the combined epi+alea ``rgb_var``/``rgb_std`` when
    processing k="rgb", but the *later* dict keys "rgb_var"/"rgb_std"
    overwrite them with plain member means — so its effective ``*_std`` for
    active-* ensembles is the member-mean aleatoric std, and the combined
    values survive only under ``*_var_epi``/``*_var_alea``. With
    ``parity_mode=True`` (default) we reproduce that exactly; the properly
    combined values are always additionally exposed as ``*_var_combined``/
    ``*_std_combined``.
    """
    outputs: dict[str, jax.Array] = {}
    has_alea = "rgb_std" in stacked and "depth_std" in stacked
    for k, v in stacked.items():
        outputs[k] = jnp.mean(v, axis=0)
    if has_alea:
        for k in ("rgb", "depth"):
            var_alea = _channel_mean(jnp.mean(stacked[k + "_var"], axis=0))
            var_epi = _channel_mean(jnp.var(stacked[k], axis=0, ddof=1))
            outputs[k + "_var_alea"] = var_alea
            outputs[k + "_var_epi"] = var_epi
            outputs[k + "_var_combined"] = var_epi + var_alea
            outputs[k + "_std_combined"] = jnp.sqrt(var_epi + var_alea)
            if not parity_mode:
                outputs[k + "_var"] = outputs[k + "_var_combined"]
                outputs[k + "_std"] = outputs[k + "_std_combined"]
            # parity_mode: keep outputs[k+"_var"]/[k+"_std"] as the member
            # means already written above (the reference's effective values)
    else:
        for k in ("rgb", "depth", "expected_depth"):
            if k in stacked:
                outputs[k + "_std"] = _channel_mean(jnp.std(stacked[k], axis=0, ddof=1))
                outputs[k + "_var"] = outputs[k + "_std"] ** 2
    return outputs
