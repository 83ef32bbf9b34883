"""Nerfacto-style radiance field (hash grid + MLPs) with uncertainty hooks.

One field serves every uncertainty method in the reference
(`/root/reference/nerfuncertainty/models/*/..._field.py`):

  * **decomposed last layers** — the base MLP ends in a shared trunk from
    which separate ``density_head`` (hidden->1), ``geo_head``
    (hidden->geo_feat) and optional ``unc_head`` (hidden->1) linears branch;
    the color MLP ends in a separate ``rgb_head`` (hidden->3) before the
    sigmoid. Mathematically identical to nerfacto's fused output layer, but
    the Laplace method (`laplace_field.py:129-229` decomposition into
    ``mlp_density`` / ``mlp_rgb_ll``) can address exactly these two leaves
    in the param pytree for its posterior.
  * **aleatoric channel** — ``num_uncertainty_channels=1`` reproduces
    active-nerfacto's widened base output + softplus/beta_min activation
    (`activenerfacto_field.py:148-157,120-121,190`).
  * **dropout** — ``density_dropout_layers`` / ``rgb_dropout_layers`` +
    ``dropout_rate`` reproduce the MC-dropout field
    (`mcdropout_fields.py:112-144`); at inference MC sampling is a
    ``vmap`` over PRNG keys with ``deterministic=False``.

TPU notes: all widths default to 64 (MXU-tileable once the sample batch is
large); the hash-grid gather dominates, MLPs fuse into a few matmuls.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.ops.activations import shifted_softplus, trunc_exp
from uncertainty_nerf_gs_tpu.ops.encodings import (
    CellHashEncoding,
    HashEncoding,
    HybridHashEncoding,
    nerf_encoding,
    sh_encoding,
)
from uncertainty_nerf_gs_tpu.ops.mlp import MLP
from uncertainty_nerf_gs_tpu.ops.spatial import contract_to_unit_cube, normalize_aabb

_GRID_LAYOUTS = {
    "cell": CellHashEncoding,
    "corner": HashEncoding,
    "hybrid": HybridHashEncoding,
}


class FieldOutputs(NamedTuple):
    density: jax.Array  # (..., S)
    rgb: jax.Array  # (..., S, 3)
    uncertainty: jax.Array | None  # (..., S) aleatoric betas, or None
    density_before_activation: jax.Array  # (..., S)
    trunk: jax.Array  # (..., S, W) shared base features (Laplace inputs)
    color_penultimate: jax.Array  # (..., S, W) rgb_head inputs (Laplace)


class NerfactoField(nn.Module):
    """Hash-grid NeRF field; see module docstring."""

    num_images: int = 1
    # hash grid
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    # base mlp
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    # color mlp
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    # appearance
    appearance_embed_dim: int = 32
    use_appearance_embedding: bool = True
    # space
    use_scene_contraction: bool = True
    aabb: Any = None  # (2, 3) array-like when not using contraction
    # uncertainty
    num_uncertainty_channels: int = 0
    beta_min: float = 0.01
    density_activation: str = "trunc_exp"  # or "softplus"
    # dropout (MC-dropout)
    density_dropout_layers: Sequence[int] = ()
    rgb_dropout_layers: Sequence[int] = ()
    dropout_rate: float = 0.0
    # SH direction encoding degree
    sh_levels: int = 4
    # bf16 hidden compute (reference AMP parity); heads stay f32
    compute_dtype: Any = None
    # "cell" = cell-major grid, one gather per sample-level (TPU-fast; see
    # ops/encodings.py cell-major notes); "corner" = tcnn-parity semantics;
    # "hybrid" = dense levels canonical-corner (exact sharing) expanded to
    # cell rows, hashed levels cell-native — one gather per sample-level
    # AND the corner-sharing prior on coarse structure
    grid_layout: str = "cell"

    def setup(self):
        enc_cls = _GRID_LAYOUTS[self.grid_layout]
        self.encoding = enc_cls(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        # trunk: hidden layers of the base MLP (>=1 layer so heads have
        # a hidden input even when num_layers == 2 overall)
        self.base_mlp = MLP(
            num_layers=max(self.num_layers - 1, 1),
            layer_width=self.hidden_dim,
            out_dim=self.hidden_dim,
            out_activation=nn.relu,
            dropout_layers=self.density_dropout_layers,
            dropout_rate=self.dropout_rate,
            compute_dtype=self.compute_dtype,
        )
        self.density_head = nn.Dense(1, name="density_head")
        self.geo_head = nn.Dense(self.geo_feat_dim, name="geo_head")
        if self.num_uncertainty_channels:
            self.unc_head = nn.Dense(self.num_uncertainty_channels, name="unc_head")
        if self.use_appearance_embedding:
            self.appearance_embedding = nn.Embed(
                self.num_images, self.appearance_embed_dim
            )
        self.color_trunk = MLP(
            num_layers=max(self.num_layers_color - 1, 1),
            layer_width=self.hidden_dim_color,
            out_dim=self.hidden_dim_color,
            out_activation=nn.relu,
            dropout_layers=self.rgb_dropout_layers,
            dropout_rate=self.dropout_rate,
            compute_dtype=self.compute_dtype,
        )
        self.rgb_head = nn.Dense(3, name="rgb_head")

    def _normalize_positions(self, positions: jax.Array):
        if self.use_scene_contraction:
            normalized = contract_to_unit_cube(positions)
            selector = jnp.ones(positions.shape[:-1], positions.dtype)
        else:
            aabb = jnp.asarray(self.aabb, jnp.float32)
            normalized = normalize_aabb(positions, aabb)
            inside = jnp.all((normalized >= 0.0) & (normalized <= 1.0), axis=-1)
            selector = inside.astype(positions.dtype)
            normalized = jnp.clip(normalized, 0.0, 1.0)
        return normalized, selector

    def _activate_density(self, raw: jax.Array) -> jax.Array:
        if self.density_activation == "trunc_exp":
            return trunc_exp(raw)
        return nn.softplus(raw)

    def get_trunk(
        self, positions: jax.Array, *, deterministic: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        """Hash encode + base trunk. Returns (trunk (..., W), selector)."""
        normalized, selector = self._normalize_positions(positions)
        feats = self.encoding(normalized)
        trunk = self.base_mlp(feats, deterministic=deterministic)
        return trunk, selector

    def get_density(
        self, positions: jax.Array, *, deterministic: bool = True
    ):
        """Density (+ optional aleatoric channel) at positions (..., 3)."""
        trunk, selector = self.get_trunk(positions, deterministic=deterministic)
        raw = self.density_head(trunk)[..., 0]
        density = self._activate_density(raw) * selector
        unc = None
        if self.num_uncertainty_channels:
            unc = shifted_softplus(self.unc_head(trunk)[..., 0], self.beta_min)
        return density, trunk, unc, raw

    def forward_from_feats(
        self,
        feats: jax.Array,
        selector: jax.Array,
        directions: jax.Array,
        camera_indices: jax.Array,
        *,
        deterministic: bool = True,
        use_average_appearance: bool = False,
    ) -> FieldOutputs:
        """Full field forward from precomputed hash-grid features.

        Used by the fused ensemble render (`parallel/ensemble_fused.py`):
        the member-packed gather produces per-member features outside the
        module, then this runs the member's MLPs/heads under `vmap`.
        """
        trunk = self.base_mlp(feats, deterministic=deterministic)
        raw = self.density_head(trunk)[..., 0]
        density = self._activate_density(raw) * selector
        unc = None
        if self.num_uncertainty_channels:
            unc = shifted_softplus(self.unc_head(trunk)[..., 0], self.beta_min)
        pen = self.get_color_features(
            trunk,
            directions,
            camera_indices,
            deterministic=deterministic,
            use_average_appearance=use_average_appearance,
        )
        rgb = nn.sigmoid(self.rgb_head(pen))
        return FieldOutputs(
            density=density,
            rgb=rgb,
            uncertainty=unc,
            density_before_activation=raw,
            trunk=trunk,
            color_penultimate=pen,
        )

    def get_color_features(
        self,
        trunk: jax.Array,
        directions: jax.Array,
        camera_indices: jax.Array,
        *,
        deterministic: bool = True,
        use_average_appearance: bool = False,
    ) -> jax.Array:
        """Color-MLP penultimate features; inputs broadcast over samples."""
        geo = self.geo_head(trunk)
        sh = sh_encoding(directions, levels=self.sh_levels)
        sh = jnp.broadcast_to(
            sh[..., None, :], trunk.shape[:-1] + (sh.shape[-1],)
        )
        parts = [geo, sh]
        if self.use_appearance_embedding:
            if use_average_appearance:
                embed = jnp.mean(self.appearance_embedding.embedding, axis=0)
                embed = jnp.broadcast_to(
                    embed, trunk.shape[:-1] + (self.appearance_embed_dim,)
                )
            else:
                embed = self.appearance_embedding(camera_indices)
                embed = jnp.broadcast_to(
                    embed[..., None, :],
                    trunk.shape[:-1] + (self.appearance_embed_dim,),
                )
            parts.append(embed)
        h = jnp.concatenate(parts, axis=-1)
        return self.color_trunk(h, deterministic=deterministic)

    def __call__(
        self,
        positions: jax.Array,
        directions: jax.Array,
        camera_indices: jax.Array,
        *,
        deterministic: bool = True,
        use_average_appearance: bool = False,
    ) -> FieldOutputs:
        """Full field forward.

        positions: (R, S, 3); directions: (R, 3); camera_indices: (R,).
        """
        density, trunk, unc, raw = self.get_density(
            positions, deterministic=deterministic
        )
        pen = self.get_color_features(
            trunk,
            directions,
            camera_indices,
            deterministic=deterministic,
            use_average_appearance=use_average_appearance,
        )
        rgb = nn.sigmoid(self.rgb_head(pen))
        return FieldOutputs(
            density=density,
            rgb=rgb,
            uncertainty=unc,
            density_before_activation=raw,
            trunk=trunk,
            color_penultimate=pen,
        )

    def density_fn(self, positions: jax.Array) -> jax.Array:
        """Density-only evaluation (used by the proposal sampler)."""
        density, _, _, _ = self.get_density(positions)
        return density


class ProposalDensityField(nn.Module):
    """Small density-only hash field for the proposal hierarchy
    (nerfacto's ``HashMLPDensityField``)."""

    num_levels: int = 5
    base_res: int = 16
    max_res: int = 128
    log2_hashmap_size: int = 17
    features_per_level: int = 2
    num_layers: int = 2
    hidden_dim: int = 16
    use_scene_contraction: bool = True
    aabb: Any = None
    compute_dtype: Any = None
    # "hash" (nerfacto's HashMLPDensityField) or "mlp" — a gather-free
    # frequency-encoded MLP density. TPU rationale: proposal fields account
    # for ~2/3 of all hash-table gathers per ray and XLA's dynamic gather
    # is the nerfacto-forward bottleneck on TPU; the MLP variant trades
    # those gathers for MXU matmuls (near-free).
    field_type: str = "hash"
    num_frequencies: int = 5
    grid_layout: str = "cell"  # see NerfactoField.grid_layout

    def setup(self):
        if self.field_type != "mlp":
            enc_cls = _GRID_LAYOUTS[self.grid_layout]
            self.encoding = enc_cls(
                num_levels=self.num_levels,
                min_res=self.base_res,
                max_res=self.max_res,
                log2_hashmap_size=self.log2_hashmap_size,
                features_per_level=self.features_per_level,
            )
        self.mlp = MLP(
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1,
            compute_dtype=self.compute_dtype,
        )

    def _normalize(self, positions: jax.Array):
        if self.use_scene_contraction:
            normalized = contract_to_unit_cube(positions)
            selector = jnp.ones(positions.shape[:-1], positions.dtype)
        else:
            aabb = jnp.asarray(self.aabb, jnp.float32)
            normalized = normalize_aabb(positions, aabb)
            inside = jnp.all((normalized >= 0.0) & (normalized <= 1.0), axis=-1)
            selector = inside.astype(positions.dtype)
            normalized = jnp.clip(normalized, 0.0, 1.0)
        return normalized, selector

    def density_from_feats(
        self, feats: jax.Array, selector: jax.Array
    ) -> jax.Array:
        """Density from precomputed grid features (fused ensemble path)."""
        raw = self.mlp(feats)[..., 0]
        return trunc_exp(raw) * selector

    def __call__(self, positions: jax.Array) -> jax.Array:
        normalized, selector = self._normalize(positions)
        if self.field_type == "mlp":
            feats = nerf_encoding(
                normalized,
                num_frequencies=self.num_frequencies,
                min_freq_exp=0.0,
                max_freq_exp=float(self.num_frequencies - 1),
                include_input=True,
            )
        else:
            feats = self.encoding(normalized)
        return self.density_from_feats(feats, selector)
