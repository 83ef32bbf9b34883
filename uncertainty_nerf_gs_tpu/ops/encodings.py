"""Positional / directional encodings: spherical harmonics, NeRF frequency,
multi-resolution hash grid.

TPU-native replacements for the tiny-cuda-nn encoders the reference selects
with ``implementation="tcnn"`` (`/root/reference/nerfuncertainty/models/
laplace/laplace_field.py:91,116-136`):

  * :func:`sh_encoding` — closed-form real SH basis up to degree 4 of a unit
    direction (tcnn ``SphericalHarmonics`` semantics: components of all
    degrees < ``levels``).
  * :func:`nerf_encoding` — sin/cos frequency encoding.
  * :class:`HashEncoding` — multi-resolution hash grid with trilinear
    interpolation. Lookups are one big gather per level batch; gradients
    scatter-add into the table through XLA's gather transpose. Table feature
    width is kept a multiple of 2 and the per-point output is a dense
    ``levels * features_per_level`` vector feeding the MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Spherical harmonics (degree <= 4, i.e. up to 16 components).
# ---------------------------------------------------------------------------


def sh_encoding(directions: jax.Array, levels: int = 4) -> jax.Array:
    """Real SH basis values for unit directions.

    Args:
      directions: (..., 3) unit vectors.
      levels: number of SH degrees (1..4), output has levels**2 components.
    """
    if not 1 <= levels <= 4:
        raise ValueError(f"SH levels must be in [1,4], got {levels}")
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    comps = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.9461746957575601 * zz - 0.31539156525252005,
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def nerf_encoding(
    x: jax.Array,
    num_frequencies: int = 6,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 5.0,
    include_input: bool = False,
) -> jax.Array:
    """Classic NeRF sin/cos frequency encoding of (..., d) inputs."""
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = x[..., None] * freqs  # (..., d, F)
    scaled = scaled.reshape(*x.shape[:-1], -1) * 2.0 * math.pi
    out = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    if include_input:
        out = jnp.concatenate([x, out], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Multi-resolution hash grid.
# ---------------------------------------------------------------------------

_PRIMES = (1, 2654435761, 805459861)


def _hash_corner_indices(
    corners: jax.Array, resolution: jax.Array, table_size: int
) -> jax.Array:
    """Map integer grid coords (..., 3) to table slots.

    Dense indexing when the level's grid fits in the table, spatial hashing
    otherwise (tcnn semantics).
    """
    cx = corners[..., 0].astype(jnp.uint32)
    cy = corners[..., 1].astype(jnp.uint32)
    cz = corners[..., 2].astype(jnp.uint32)
    res = resolution.astype(jnp.uint32)
    dense = cx + res * (cy + res * cz)
    hashed = (
        cx * jnp.uint32(_PRIMES[0])
        ^ cy * jnp.uint32(_PRIMES[1])
        ^ cz * jnp.uint32(_PRIMES[2])
    )
    # compare in float64-safe space: (res+1)^3 overflows int32 for res >= 1290
    use_dense = (resolution.astype(jnp.float32) + 1.0) ** 3 <= table_size
    idx = jnp.where(use_dense, dense, hashed)
    return (idx % jnp.uint32(table_size)).astype(jnp.int32)


def hash_encoding_lookup(
    table: jax.Array,
    positions: jax.Array,
    resolutions: jax.Array,
    features_per_level: int = 2,
) -> jax.Array:
    """Trilinear hash-grid interpolation.

    Args:
      table: (levels, features, table_size) parameter table. TPU layout
        rationale (measured on a v5e): the table axis must be minormost
        (lane dim) both so the array doesn't lane-pad at rest (a
        (..., table, F) layout pads F=2 -> 128, a 64x HBM blowup) and so the
        lookups lower to XLA's lane-axis dynamic-gather path — one
        ``jnp.take(..., axis=-1)`` per level, unrolled in Python (the
        unrolled form is ~2x faster than a vmapped batched gather and ~5x
        faster than element gathers from a flat table).
      positions: (n, 3) in [0, 1].
      resolutions: (levels,) int per-level base resolution.
      features_per_level: F.

    Returns:
      (n, levels * features) encoded features.
    """
    levels, feats, table_size = table.shape
    assert feats == features_per_level
    assert 128 % feats == 0, "features_per_level must divide 128"
    n = positions.shape[0]
    res_np = np.asarray(resolutions)

    # gather path: interleaved-feature 128-lane ROW gathers + VPU one-hot
    # lane selects. Entry e's features live contiguously at lanes
    # (e % epr)*F + f of row e // epr (epr = 128 // F entries per row), so
    # ONE row gather serves all F features. On a v5e this is ~10x faster
    # than element gathers from a flat table and 2x fewer gathers than
    # per-feature rows (the row fetch is the bottleneck; the selects fuse).
    epr = 128 // feats  # entries per 128-lane row
    pad = (-table_size) % epr
    rows_per_level = (table_size + pad) // epr
    # (L, F, T) -> (L, rows, 128) interleaved: transpose to (T, F) then flat
    table_rows = (
        jnp.pad(table, ((0, 0), (0, 0), (0, pad)))
        .transpose(0, 2, 1)
        .reshape(levels, rows_per_level, 128)
    )
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # 8 corners: offsets in {0,1}^3
    offsets = jnp.array(
        [
            [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
            [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
        ],
        dtype=jnp.int32,
    )

    outs = []
    for lvl in range(levels):
        # every big intermediate keeps the point axis n minormost (lane dim)
        res = res_np[lvl]
        scaled = positions * res  # cells span [0, res], res+1 corner points
        base = jnp.floor(scaled)
        frac = scaled - base
        base = base.astype(jnp.int32)
        corners = base.T[None, :, :] + offsets[:, :, None]  # (8, 3, n)
        idx = _hash_corner_indices(
            jnp.moveaxis(corners, 1, -1), jnp.int32(res), table_size
        ).reshape(-1)  # (8n,)
        w = jnp.where(
            offsets[:, :, None] == 1, frac.T[None], 1.0 - frac.T[None]
        ).prod(axis=1)  # (8, n)
        rows = table_rows[lvl][idx // epr]  # (8n, 128) one row gather
        lane0 = (idx % epr) * feats
        feats_lvl = []
        for f in range(feats):
            onehot = (lane_iota == (lane0 + f)[:, None]).astype(table.dtype)
            vals = jnp.sum(rows * onehot, axis=1).reshape(8, n)
            feats_lvl.append(jnp.sum(vals * w, axis=0))  # (n,)
        outs.append(jnp.stack(feats_lvl, 0))  # (F, n)
    return jnp.concatenate(outs, 0).T  # (n, L*F)


def hash_grid_resolutions(
    num_levels: int, min_res: int, max_res: int
) -> np.ndarray:
    """Per-level resolutions N_l = floor(N_min * b^l) with tcnn's growth
    factor. Host numpy on purpose: resolutions are static (they select
    dense-vs-hash indexing and unroll the level loop)."""
    if num_levels > 1:
        growth = math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    return np.array(
        [int(math.floor(min_res * growth**lvl)) for lvl in range(num_levels)],
        dtype=np.int32,
    )


class HashEncoding(nn.Module):
    """Multi-resolution hash-grid encoder (flax module owning the table)."""

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    init_scale: float = 1e-4

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        table_size = 2**self.log2_hashmap_size
        # layout note: table axis minormost — see hash_encoding_lookup
        # docstring (lane-padding at rest + lane-axis gather path).
        table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key,
                (self.num_levels, self.features_per_level, table_size),
                minval=-self.init_scale,
                maxval=self.init_scale,
            ),
        )
        resolutions = hash_grid_resolutions(self.num_levels, self.min_res, self.max_res)
        flat = positions.reshape(-1, 3)
        out = hash_encoding_lookup(table, flat, resolutions, self.features_per_level)
        return out.reshape(*positions.shape[:-1], self.output_dim)
