"""Nerfacto-family model: proposal-sampled NeRF with uncertainty heads.

One model covers three reference methods (SURVEY §7 design: uncertainty as
axes/heads on a shared core, not subclasses):

  * plain **nerfacto** (`uncertainty_channels=0`) — nerfstudio's model the
    reference subclasses;
  * **active-nerfacto** (`uncertainty_channels=1`) — aleatoric RGB variance
    head, uncertainty rendered with squared weights, Gaussian NLL + density
    L1 training loss (`/root/reference/nerfuncertainty/models/
    activenerfacto/activenerfacto_model.py:104-112,155-191`);
  * **nerfacto-mcdropout** (`dropout_rate>0`) — dropout layers in density/
    color MLPs (`mcdropout_fields.py:112-144`); MC inference lives in
    `models/mcdropout.py` as a vmap over PRNG keys.

The Laplace posterior (`models/laplace.py`) reuses the same model and
addresses the field's ``density_head`` / ``rgb_head`` leaves.

Forward = 2-level proposal hierarchy (uniform 256 -> pdf 96 -> pdf 48 on the
main field) fully under jit with static shapes; training regularizers are
the Mip-NeRF 360 interlevel + distortion losses.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.fields.nerfacto_field import NerfactoField, ProposalDensityField
from uncertainty_nerf_gs_tpu.ops import raymarch
from uncertainty_nerf_gs_tpu.ops.sampling import (
    RayBundle,
    sample_pdf,
    sample_uniform,
)


@dataclasses.dataclass(frozen=True)
class NerfactoConfig:
    """Model hyper-parameters (nerfstudio NerfactoModelConfig defaults, plus
    the reference's uncertainty knobs)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    num_images: int = 1
    # sampling
    num_proposal_samples: tuple = (256, 96)
    num_nerf_samples: int = 48
    proposal_weights_anneal_max_num_iters: int = 1000
    proposal_weights_anneal_slope: float = 10.0
    # main field
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    geo_feat_dim: int = 15
    num_layers: int = 2
    num_layers_color: int = 3
    appearance_embed_dim: int = 32
    use_appearance_embedding: bool = True
    average_init_density: float = 0.01
    use_scene_contraction: bool = True
    aabb: Any = None
    background_color: str = "last_sample"  # random | last_sample | white | black
    # proposal fields (nerfacto's two levels); "hash" = reference parity,
    # "mlp" = gather-free frequency-MLP density (TPU-fast, see
    # ProposalDensityField.field_type) — per-net override via
    # proposal_net_args["field_type"]
    proposal_field_type: str = "hash"
    # hash-grid physical layout: "cell" (one gather per sample-level,
    # TPU-fast, the default), "corner" (tcnn-parity semantics), or
    # "hybrid" (dense levels canonical-corner expanded to cell rows —
    # corner-sharing prior AND one gather per sample-level)
    grid_layout: str = "cell"
    proposal_net_args: tuple = (
        dict(num_levels=5, max_res=128, log2_hashmap_size=17, hidden_dim=16),
        dict(num_levels=5, max_res=256, log2_hashmap_size=17, hidden_dim=16),
    )
    # losses
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    # cross-face corner-consistency penalty on cell-stored grid levels
    # (ops/encodings.py::face_consistency_loss): softly restores the tcnn
    # corner-sharing prior the cell layout trades away. 0 = off (no
    # reference counterpart — tcnn corners are shared by construction).
    face_consistency_mult: float = 0.0
    face_consistency_samples: int = 1024
    # uncertainty (active-nerfacto)
    uncertainty_channels: int = 0
    beta_min: float = 0.01
    density_loss_mult: float = 0.01
    rendered_uncertainty_eps: float = 1e-6
    # dropout (mc-dropout): reference defaults rate 0.2 before last layers
    # (`mcdropout_models.py:30-44`)
    density_dropout_layers: tuple = ()
    rgb_dropout_layers: tuple = ()
    dropout_rate: float = 0.0
    density_activation: str = "trunc_exp"
    # bf16 hidden MLP compute (reference configs set mixed_precision=True)
    mixed_precision: bool = False
    # rendering
    eval_num_rays_per_chunk: int = 1 << 12


class NerfactoModel(nn.Module):
    """Proposal-sampled hash-grid NeRF; see module docstring."""

    config: NerfactoConfig

    def setup(self):
        cfg = self.config
        if cfg.aabb is None and not cfg.use_scene_contraction:
            # Blender-style unit-box default when contraction is disabled
            cfg = dataclasses.replace(
                cfg, aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))
            )
        compute_dtype = jnp.bfloat16 if cfg.mixed_precision else None
        self.proposal_fields = [
            ProposalDensityField(
                num_levels=args.get("num_levels", 5),
                base_res=16,
                max_res=args.get("max_res", 128),
                log2_hashmap_size=args.get("log2_hashmap_size", 17),
                hidden_dim=args.get("hidden_dim", 16),
                use_scene_contraction=cfg.use_scene_contraction,
                aabb=cfg.aabb,
                compute_dtype=compute_dtype,
                field_type=args.get("field_type", cfg.proposal_field_type),
                grid_layout=cfg.grid_layout,
                name=f"proposal_{i}",
            )
            for i, args in enumerate(cfg.proposal_net_args)
        ]
        self.field = NerfactoField(
            num_images=cfg.num_images,
            num_levels=cfg.num_levels,
            base_res=cfg.base_res,
            max_res=cfg.max_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            features_per_level=cfg.features_per_level,
            num_layers=cfg.num_layers,
            hidden_dim=cfg.hidden_dim,
            geo_feat_dim=cfg.geo_feat_dim,
            num_layers_color=cfg.num_layers_color,
            hidden_dim_color=cfg.hidden_dim_color,
            appearance_embed_dim=cfg.appearance_embed_dim,
            use_appearance_embedding=cfg.use_appearance_embedding,
            use_scene_contraction=cfg.use_scene_contraction,
            aabb=cfg.aabb,
            num_uncertainty_channels=cfg.uncertainty_channels,
            beta_min=cfg.beta_min,
            density_activation=cfg.density_activation,
            density_dropout_layers=cfg.density_dropout_layers,
            rgb_dropout_layers=cfg.rgb_dropout_layers,
            dropout_rate=cfg.dropout_rate,
            compute_dtype=compute_dtype,
            grid_layout=cfg.grid_layout,
            name="field",
        )

    def _background(
        self, rgbs: jax.Array, weights: jax.Array, key: jax.Array | None
    ) -> jax.Array | None:
        mode = self.config.background_color
        if mode == "white":
            return jnp.ones(3)
        if mode == "black":
            return jnp.zeros(3)
        if mode == "last_sample":
            return jax.lax.stop_gradient(rgbs[..., -1, :])
        if mode == "random" and key is not None:
            return jax.random.uniform(key, rgbs.shape[:-2] + (3,))
        return jnp.zeros(3)

    def __call__(
        self,
        ray_bundle: RayBundle,
        *,
        train: bool = False,
        rngs_key: jax.Array | None = None,
        proposal_anneal: float | jax.Array = 1.0,
        use_average_appearance: bool = False,
        deterministic_dropout: bool = True,
        return_intermediates: bool = False,
    ) -> dict[str, jax.Array]:
        cfg = self.config
        ray_bundle = ray_bundle._replace(
            nears=jnp.full_like(ray_bundle.nears, cfg.near_plane),
            fars=jnp.full_like(ray_bundle.fars, cfg.far_plane),
        )

        num_levels = len(self.proposal_fields)
        if rngs_key is not None:
            keys = jax.random.split(rngs_key, num_levels + 2)
            k_uniform, k_bg = keys[0], keys[-1]
            k_pdfs = list(keys[1:-1])
        else:
            k_uniform = k_bg = None
            k_pdfs = [None] * num_levels

        # --- proposal hierarchy (any number of levels) ---------------------
        weights_list: list[jax.Array] = []
        sdist_list: list[jax.Array] = []

        rs = sample_uniform(ray_bundle, cfg.num_proposal_samples[0], key=k_uniform)
        for i, prop_field in enumerate(self.proposal_fields):
            d = prop_field(rs.positions)
            w = raymarch.render_weights(d, rs.deltas)
            w_annealed = jnp.power(w, proposal_anneal)
            weights_list.append(w)
            sdist_list.append(rs.spacing_edges)
            n_next = (
                cfg.num_proposal_samples[i + 1]
                if i + 1 < num_levels
                else cfg.num_nerf_samples
            )
            rs = sample_pdf(
                ray_bundle, rs.spacing_edges,
                jax.lax.stop_gradient(w_annealed), n_next, key=k_pdfs[i],
            )

        # --- main field ----------------------------------------------------
        field_out = self.field(
            rs.positions,
            ray_bundle.directions,
            ray_bundle.camera_indices,
            deterministic=deterministic_dropout,
            use_average_appearance=use_average_appearance,
        )
        density = cfg.average_init_density * field_out.density
        weights = raymarch.render_weights(density, rs.deltas)

        steps = rs.midpoints
        background = self._background(field_out.rgb, weights, k_bg)
        rgb = raymarch.render_rgb(weights, field_out.rgb, background)
        accumulation = raymarch.render_accumulation(weights)
        depth = jax.lax.stop_gradient(raymarch.render_median_depth(weights, steps))
        expected_depth = raymarch.render_expected_depth(weights, steps)
        depth_var = raymarch.depth_variance(weights, steps, depth)

        outputs: dict[str, Any] = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "expected_depth": expected_depth,
            "depth_var": depth_var,
            "depth_std": jnp.sqrt(depth_var),
            "density_mean": jnp.mean(density),
        }
        if cfg.uncertainty_channels:
            betas = jnp.nan_to_num(field_out.uncertainty, nan=0.0)
            rgb_var = raymarch.render_uncertainty(betas, weights**2)
            outputs["rgb_var"] = rgb_var
            outputs["rgb_std"] = jnp.sqrt(rgb_var)
        if train:
            outputs["weights_list"] = weights_list + [weights]
            outputs["sdist_list"] = sdist_list + [rs.spacing_edges]
        if return_intermediates:
            # last-layer inputs + ray geometry for the Laplace posterior
            outputs["trunk"] = field_out.trunk
            outputs["color_penultimate"] = field_out.color_penultimate
            outputs["deltas"] = rs.deltas
            outputs["steps"] = steps
        return outputs


def nerfacto_loss(
    outputs: dict[str, jax.Array],
    batch: dict[str, jax.Array],
    config: NerfactoConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Training loss.

    Plain nerfacto: MSE + interlevel + distortion. Active: Gaussian NLL
    ``mean((pred-gt)^2/(2 var)) + 0.5 mean(log var) + 4.0`` plus density L1
    (`activenerfacto_model.py:164-170`).
    """
    gt = batch["image"]
    pred = outputs["rgb"]
    losses: dict[str, jax.Array] = {}

    if config.uncertainty_channels:
        var = jnp.maximum(outputs["rgb_var"], config.rendered_uncertainty_eps)
        losses["nll_loss"] = (
            jnp.mean((pred - gt) ** 2 / (2.0 * var[..., None]))
            + 0.5 * jnp.mean(jnp.log(var))
            + 4.0
        )
        losses["density_l1_loss"] = config.density_loss_mult * outputs["density_mean"]
    else:
        losses["rgb_loss"] = jnp.mean((pred - gt) ** 2)

    final_sdist = outputs["sdist_list"][-1]
    final_weights = outputs["weights_list"][-1]
    losses["interlevel_loss"] = config.interlevel_loss_mult * raymarch.interlevel_loss(
        final_sdist,
        final_weights,
        outputs["sdist_list"][:-1],
        outputs["weights_list"][:-1],
    )
    losses["distortion_loss"] = config.distortion_loss_mult * raymarch.distortion_loss(
        final_sdist, final_weights
    )
    total = sum(losses.values())
    return total, losses


def proposal_anneal_factor(step: jax.Array, config: NerfactoConfig) -> jax.Array:
    """Nerfacto's proposal-weight annealing: bias(x, s) = sx/((s-1)x + 1)."""
    n = config.proposal_weights_anneal_max_num_iters
    x = jnp.clip(step.astype(jnp.float32) / n, 0.0, 1.0)
    s = config.proposal_weights_anneal_slope
    return s * x / ((s - 1.0) * x + 1.0)
