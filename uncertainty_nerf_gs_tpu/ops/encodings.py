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
from typing import Any, Sequence

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


# ---------------------------------------------------------------------------
# Cell-major hash grid (TPU-fast layout).
# ---------------------------------------------------------------------------
#
# The corner-major (tcnn-semantics) lookup above needs 8 row gathers per
# (sample, level) — XLA's dynamic row gather is the single-chip throughput
# ceiling for the whole nerfacto forward (STATUS.md r1). The cell-major
# layout stores ALL 8 corner feature vectors of a grid cell contiguously in
# one table row, so one gather per (sample, level) fetches everything the
# trilinear interpolation needs; with F=2 a 128-lane row holds 8 cells'
# payloads (8 corners x 2 feats = 16 floats each).
#
# Semantics deviation vs tcnn (documented, validated by overfit tests):
# corner features are NOT shared between adjacent cells (each cell owns its
# 8 corners), so the encoded field may be discontinuous across cell faces.
# The encoding is strictly more expressive (it can represent any
# corner-shared configuration) and the MLP smooths the result; measured
# overfit quality matches the corner layout (see tests/test_ops.py).
# Dense indexing applies when res^3 fits the table; finer levels hash the
# cell base coordinate (collisions alias whole cells, like tcnn aliases
# corners).


def cell_indices(
    positions: jax.Array, res: int, table_size: int
) -> tuple[jax.Array, jax.Array]:
    """Cell index + trilinear corner weights for (n, 3) positions in [0,1].

    Returns (idx (n,), weights (n, 8)); corner order c = 4x + 2y + z matches
    the in-row corner packing of `CellHashEncoding`.
    """
    scaled = positions * res
    base = jnp.floor(jnp.clip(scaled, 0, res * (1 - 1e-7))).astype(jnp.int32)
    base = jnp.minimum(base, res - 1)
    frac = scaled - base.astype(scaled.dtype)
    if res**3 <= table_size:
        idx = base[..., 0] + res * (base[..., 1] + res * base[..., 2])
    else:
        idx = _hash_corner_indices(base, jnp.int32(res), table_size)
    wx = jnp.stack([1.0 - frac[..., 0], frac[..., 0]], -1)  # (n, 2)
    wy = jnp.stack([1.0 - frac[..., 1], frac[..., 1]], -1)
    wz = jnp.stack([1.0 - frac[..., 2], frac[..., 2]], -1)
    w = (
        wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    ).reshape(positions.shape[:-1] + (8,))
    return idx, w


def _lerp_matrices(num_lanes: int, group: int, out_dim: int, dtype=jnp.float32):
    """Constant 0/1 matrices for the lane-space trilerp reduction.

    B (8, num_lanes): broadcasts the 8 corner weights across each corner's
    ``group`` lanes (corner c owns lanes [c*group, (c+1)*group)).
    S (num_lanes, out_dim): sums lane k of every corner block into output
    lane k (out_dim = group, or fewer when the block has padding).

    Rationale: reshaping gathered 128-lane rows to (n, 8, F) forces
    lane->sublane relayouts that cost as much as the gather itself on a
    v5e; expressing "weight each corner block, then sum blocks" as two
    small matmuls keeps everything in the lane dimension (MXU-friendly,
    zero transposes).
    """
    b = np.zeros((8, num_lanes), np.float32)
    s = np.zeros((num_lanes, out_dim), np.float32)
    for c in range(8):
        b[c, c * group : (c + 1) * group] = 1.0
        s[c * group : c * group + out_dim, :] = np.eye(out_dim, dtype=np.float32)
    return jnp.asarray(b, dtype), jnp.asarray(s, dtype)


def _per_level_tables(table_rows, table_size, levels: int):
    """Normalize (tables, sizes) to per-level lists.

    Accepts either a single stacked (L, ...) array + int size (uniform
    layouts) or lists of per-level arrays + per-level sizes (the hybrid
    layout, where dense levels have res^3 cells and hashed levels
    ``table_size``)."""
    if isinstance(table_rows, (list, tuple)):
        tables = list(table_rows)
    else:
        tables = [table_rows[lvl] for lvl in range(levels)]
    if isinstance(table_size, (list, tuple, np.ndarray)):
        sizes = [int(s) for s in table_size]
    else:
        sizes = [int(table_size)] * levels
    assert len(tables) == levels and len(sizes) == levels
    return tables, sizes


def dense_corner_to_cell_rows(
    grid: jax.Array, res: int, features_per_level: int = 2
) -> jax.Array:
    """Expand a canonical corner grid to cell-major lookup rows.

    grid: (res+1, res+1, (res+1)*F) with axes (z, y, x*F) — the storage
    shape keeps the minor dim wide so the param doesn't lane-pad 64x at
    rest. Returns (n_rows, 128) cell rows (cpr cells per row, corner order
    c = 4x + 2y + z, matching `cell_indices`/`pack_member_cell_tables`).

    The expansion is 8 STATIC slices (one per corner offset) — contiguous
    copies, bandwidth-bound, no gathers — so adjacent cells share corner
    values exactly (the tcnn corner-sharing prior) while lookups stay
    one-row-per-sample. Gradients scatter back into the shared grid via
    the slice transpose (pad-add).
    """
    feats = features_per_level
    block = 8 * feats
    cpr = 128 // block
    g = grid.reshape(res + 1, res + 1, res + 1, feats)  # (z, y, x, F)
    slices = []
    for corner in range(8):
        a, b, c = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        slices.append(g[c : c + res, b : b + res, a : a + res])
    cells = jnp.stack(slices, axis=3)  # (z, y, x, 8, F)
    # linear cell index = x + res*(y + res*z) == C-order flatten of (z, y, x)
    cells = cells.reshape(res**3, block)
    pad = (-(res**3)) % cpr
    if pad:
        cells = jnp.pad(cells, ((0, pad), (0, 0)))
    return cells.reshape(-1, 128)


def cell_lookup(
    table_rows,
    positions: jax.Array,
    resolutions: Sequence[int],
    table_size,
    features_per_level: int = 2,
) -> jax.Array:
    """Single-member cell-major lookup.

    table_rows: (L, n_rows, 128) with ``cpr = 128 // (8 F)`` cells packed
    per 128-lane row (cell c lives at lanes [(c % cpr) * 8F, ...)), or a
    list of per-level (n_rows_l, 128) arrays (hybrid layout) with
    ``table_size`` a matching per-level list of cell counts.
    Returns (n, L*F). All post-gather math stays in the lane dimension
    (see `_lerp_matrices`): cell selection is a one-hot-masked lane
    reduction, trilerp a pair of constant matmuls.
    """
    feats = features_per_level
    block = 8 * feats  # lanes per cell
    cpr = 128 // block
    n = positions.shape[0]
    tables, sizes = _per_level_tables(
        table_rows, table_size, len(np.asarray(resolutions))
    )
    # cell-block select: one-hot(cell position in row) -> 128-lane mask
    cell_b = np.zeros((cpr, 128), np.float32)
    for c in range(cpr):
        cell_b[c, c * block : (c + 1) * block] = 1.0
    cell_b = jnp.asarray(cell_b)
    cell_s = np.zeros((128, block), np.float32)
    for c in range(cpr):
        cell_s[c * block : (c + 1) * block, :] = np.eye(block, dtype=np.float32)
    cell_s = jnp.asarray(cell_s)
    corner_b, corner_s = _lerp_matrices(block, feats, feats)

    outs = []
    for lvl, res in enumerate(np.asarray(resolutions)):
        idx, w = cell_indices(positions, int(res), sizes[lvl])
        rows = tables[lvl][idx // cpr]  # (n, 128): ONE gather per sample
        onehot = jax.nn.one_hot(idx % cpr, cpr, dtype=rows.dtype)  # (n, cpr)
        mask = onehot @ cell_b.astype(rows.dtype)  # (n, 128)
        cell = (rows * mask) @ cell_s.astype(rows.dtype)  # (n, 8F)
        wl = (w.astype(cell.dtype) @ corner_b.astype(cell.dtype))  # (n, 8F)
        outs.append((cell * wl) @ corner_s.astype(cell.dtype))  # (n, F)
    return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def pack_member_cell_tables(
    stacked_rows: jax.Array,
    table_size: int,
    features_per_level: int = 2,
    dtype: Any = None,
) -> jax.Array:
    """Repack M stacked member cell tables into ensemble-eval rows.

    stacked_rows: (M, L, n_rows, 128) member tables (train layout).
    Returns (L, table_size, lanes) where each row holds one cell's
    8 corners x M members x F features contiguously (lanes padded up to a
    multiple of 128), so one gather serves the whole ensemble. Done once
    per eval setup — a pure transpose/reshape on device.
    """
    feats = features_per_level
    cpr = 128 // (8 * feats)
    m, levels, n_rows, _ = stacked_rows.shape
    payload = 8 * m * feats
    lanes = ((payload + 127) // 128) * 128
    # (M, L, rows, cpr, 8, F) -> (L, T, 8, M, F) -> (L, T, 8*M*F)
    cells = stacked_rows.reshape(m, levels, n_rows, cpr, 8, feats)
    cells = cells.reshape(m, levels, n_rows * cpr, 8, feats)[:, :, :table_size]
    packed = jnp.transpose(cells, (1, 2, 3, 0, 4)).reshape(
        levels, table_size, payload
    )
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, lanes - payload)))
    if dtype is not None:
        packed = packed.astype(dtype)
    return packed


def quantize_cell_tables_int8(packed):
    """Per-level symmetric int8 quantization of fused eval rows.

    XLA's dynamic row gather on the v5e lowers ~2.8x faster for int8
    tables than bf16 at the 2^19-row main-grid size (202M vs 73M rows/s,
    measured r3) — the strategy switch keys on operand bytes. Dequant is
    FREE at lookup: the per-level scale folds into the trilerp weight
    matmul (`packed_cell_lookup` multiplies `wl` by it).

    packed: (L, T, lanes) stacked rows or a per-level list (hybrid).
    Returns {"tables": int8 rows, "scales": per-level f32 scalars} — the
    dict form every lookup below accepts in place of raw tables.
    """

    def one(t):
        t = t.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(t)), 1e-12) / 127.0
        q = jnp.clip(jnp.round(t / s), -127, 127).astype(jnp.int8)
        return q, s

    if isinstance(packed, (list, tuple)):
        qs = [one(t) for t in packed]
        return {"tables": [q for q, _ in qs], "scales": [s for _, s in qs]}
    qs = [one(packed[lvl]) for lvl in range(packed.shape[0])]
    return {"tables": jnp.stack([q for q, _ in qs]), "scales": [s for _, s in qs]}


def _unpack_quantized(packed):
    """(tables, scales-or-None) from raw tables or the int8 dict form."""
    if isinstance(packed, dict):
        return packed["tables"], packed["scales"]
    return packed, None


def fold_packed_tables(packed, fold: int, levels: int | None = None):
    """Fold ``fold`` cells into each eval-table row: (T, lanes) ->
    (T/fold, lanes*fold), lane group selected by ``idx % fold`` at lookup.

    EXACT layout change (same values, different addressing) that moves the
    gather operand under XLA's size cliff: the r3 gather study measured the
    dynamic row-gather lowering switching from 150-220M rows/s (<=2^17-row
    operands) to ~73M rows/s at the 2^19 main grid, independent of the
    touched working set — so a 4-fold 2^19 table gathers like a 2^17 one
    at 4x fetched bytes (bandwidth headroom: ~25M gathers/render x 512 B
    << chip bandwidth). Probe: experiments/jobs/323_gather_fold.py.

    Accepts stacked (L, T, lanes) arrays, per-level lists, or the int8
    dict form; levels whose row count does not divide ``fold`` keep
    fold=1. Returns the {"tables", "scales"} dict form (scales None for
    unquantized input). No fold metadata is stored: the lookups derive
    each level's fold from its lane width vs the member payload's base
    lane width — static shape information, safe under jit.
    """
    tables, scales = _unpack_quantized(packed)
    if not isinstance(tables, (list, tuple)):
        levels = tables.shape[0] if levels is None else levels
    tables, _ = _per_level_tables(
        tables, 0, levels if levels is not None else len(tables)
    )
    out_tables = []
    for t in tables:
        rows, lanes = t.shape
        f = fold if fold > 1 and rows % fold == 0 else 1
        out_tables.append(t.reshape(rows // f, lanes * f) if f > 1 else t)
    return {"tables": out_tables, "scales": scales}


def split_packed_tables(
    packed,
    levels: int | None = None,
    real_lanes: int | None = None,
    max_bytes: float = 32.0e6,
    max_parts: int = 2,
):
    """Lane-split each eval table into sub-tables of <= ``max_bytes``.

    EXACT layout change (same values, same addressing — the lookup
    concatenates the sub-gathers back lane-wise): XLA's dynamic row-gather
    lowering switches strategy on OPERAND bytes (~169 M rows/s <= 33.5 MB,
    ~68-77 at >= 42 MB — evidence/gather_physics_r5.json,
    pallas_gather_probe_r5.json), so a 67 MB member-packed level gathered
    as two <= 33.5 MB lane halves issues 2x the rows at 2.2x the per-row
    rate — a wash UNLESS the independent gathers overlap, which
    evidence/gather_overlap_r5.json measures. ``real_lanes`` additionally
    drops trailing pad lanes (the 5-member pack stores 80 real of 128
    lanes), cutting fetched bytes 38% on its own; the trilerp consumes the
    un-padded width directly (`_lerp_matrices` at the concat width).

    Levels already at or under ``max_bytes`` (and already-split tuples)
    pass through WHOLE — pad lanes kept: measured r5 (jobs 409/412),
    single-part narrow-width gathers are pathological (pad-dropping the
    already-fast 16.8 MB proposal tables cost the stride8 render 17%, and
    bf16 split into 3 narrow parts halved throughput), so splitting only
    pays when it moves a slow-mode (>= 42 MB) operand under the cliff in
    at most ``max_parts`` non-narrow slices — exactly the 5-member int8
    case (42 MB -> 2 x 21 MB: +25% on the exact render). Levels needing
    more than ``max_parts`` parts also pass through whole. Returns the
    {"tables", "scales"} dict form; split levels are TUPLES of
    (rows, w_i) arrays (lists stay per-level containers everywhere else).
    """
    tables, scales = _unpack_quantized(packed)
    if not isinstance(tables, (list, tuple)):
        levels = tables.shape[0] if levels is None else levels
    tables, _ = _per_level_tables(
        tables, 0, levels if levels is not None else len(tables)
    )
    out_tables = []
    for t in tables:
        if isinstance(t, tuple):
            out_tables.append(t)
            continue
        rows, lanes = t.shape
        w = min(real_lanes, lanes) if real_lanes else lanes
        nbytes = rows * w * t.dtype.itemsize
        parts = max(1, -(-int(nbytes) // int(max_bytes)))
        if parts == 1 or parts > max_parts:
            out_tables.append(t)  # whole, pad kept (see docstring)
            continue
        pw = -(-w // parts)
        pw = ((pw + 7) // 8) * 8  # 8-lane multiples
        bounds = list(range(0, w, pw))
        bounds = bounds + [w] if bounds[-1] != w else bounds
        out_tables.append(
            tuple(t[:, a:b] for a, b in zip(bounds[:-1], bounds[1:]))
        )
    return {"tables": out_tables, "scales": scales}


def _base_lanes(num_members: int, features_per_level: int) -> int:
    """Lane width of one unfolded eval row (pack_member_cell_tables)."""
    payload = 8 * num_members * features_per_level
    return ((payload + 127) // 128) * 128


def packed_cell_lookup(
    packed,
    positions: jax.Array,
    resolutions: Sequence[int],
    table_size,
    num_members: int,
    features_per_level: int = 2,
) -> jax.Array:
    """Ensemble cell-major lookup: one gather serves all M members.

    packed: (L, table_size, lanes) from `pack_member_cell_tables` (corner c
    of a cell owns lanes [c*M*F, (c+1)*M*F)), or a per-level list of
    (T_l, lanes) arrays with ``table_size`` a matching per-level list
    (hybrid layout), or the `quantize_cell_tables_int8` dict form (int8
    rows + per-level scales folded into the trilerp weights). Returns
    (M, n, L*F) float32.

    Post-gather math is lane-space matmuls (see `_lerp_matrices`): trilerp
    reduces each level to (n, M*F) member-major lanes; a final per-member
    0/1 lane-permutation matmul splits members into a leading batch axis
    without lane->sublane relayouts.
    """
    feats = features_per_level
    m = num_members
    mf = m * feats
    levels = len(np.asarray(resolutions))
    packed, scales = _unpack_quantized(packed)
    tables, sizes = _per_level_tables(packed, table_size, levels)
    lanes = _base_lanes(m, feats)
    n = positions.shape[0]
    corner_b, corner_s = _lerp_matrices(lanes, mf, mf)

    outs = []
    for lvl, res in enumerate(np.asarray(resolutions)):
        idx, w = cell_indices(positions, int(res), sizes[lvl])
        t = tables[lvl]
        if isinstance(t, tuple):
            # lane-split sub-tables (`split_packed_tables`): one gather per
            # sub-table, lane concat restores the (possibly un-padded) row
            rows = jnp.concatenate([st[idx] for st in t], axis=-1)
        else:
            f = t.shape[-1] // lanes  # fold factor (static shape)
            if f > 1:
                # folded rows (see `fold_packed_tables`): gather idx//f,
                # then one-hot select the cell's lane group — the
                # multiply+tiny-sum fuses into the gather consumer
                rows = t[idx // f]  # (n, lanes*f)
                cd = jnp.float32 if scales is not None else rows.dtype
                oh = jax.nn.one_hot(idx % f, f, dtype=cd)
                rows = jnp.sum(
                    rows.reshape(n, f, lanes).astype(cd) * oh[:, :, None],
                    axis=1,
                )  # (n, lanes)
            else:
                rows = t[idx]  # (n, lanes)
        rw = rows.shape[-1]
        cb, cs = (
            (corner_b, corner_s) if rw == lanes
            else _lerp_matrices(rw, mf, mf)
        )
        if scales is not None:  # int8 rows: dequant scale rides on wl
            wl = (w @ cb) * scales[lvl]  # (n, rw) f32
            rows = rows.astype(jnp.float32)
        else:
            wl = w.astype(rows.dtype) @ cb.astype(rows.dtype)
        outs.append(((rows * wl) @ cs.astype(rows.dtype)))  # (n, MF)
    all_lvls = jnp.concatenate(outs, axis=-1).astype(jnp.float32)  # (n, L*MF)

    # member split: out[mm, :, l*F+f] = all_lvls[:, l*MF + mm*F + f]
    perms = np.zeros((m, levels * mf, levels * feats), np.float32)
    for mm in range(m):
        for lvl in range(levels):
            for f in range(feats):
                perms[mm, lvl * mf + mm * feats + f, lvl * feats + f] = 1.0
    perms = jnp.asarray(perms)
    return jnp.einsum("nk,mko->mno", all_lvls, perms)


def packed_cell_lookup_strided(
    packed,
    norm_positions: jax.Array,
    t_mid: jax.Array,
    resolutions: Sequence[int],
    table_size,
    num_members: int,
    features_per_level: int = 2,
    max_stride: int = 8,
    stride_scale: float = 1.0,
) -> jax.Array:
    """Ensemble lookup with per-level anchor striding along the ray.

    At a level of resolution R_l, consecutive ray samples usually land in
    the same grid cell (a ray crosses <= ~R_l*sqrt(3) cells), so most of
    the per-sample gathers fetch duplicate rows. This evaluates level l
    only at every K_l-th sample (K_l = clamp(stride_scale * S // (2 R_l),
    1, max_stride); stride_scale > 1 models samples concentrated into a
    ~1/stride_scale fraction of the ray, as after PDF resampling)
    and linearly interpolates features along the ray between anchors —
    exact when both anchors share the sample's cell (trilerp is linear in
    position), a mild smoothing otherwise. Bracketing anchor indices are
    STATIC (sample s brackets to anchors s//K and s//K+1), so no dynamic
    gathers are introduced.

    norm_positions: (R, S, 3) normalized positions; t_mid: (R, S) ray
    parameters (any monotone-in-s parameterization). Returns (M, R, S, L*F).
    """
    feats = features_per_level
    m = num_members
    r, s, _ = norm_positions.shape
    levels = len(np.asarray(resolutions))
    packed, scales = _unpack_quantized(packed)
    tables, sizes = _per_level_tables(packed, table_size, levels)

    def level_packed(lvl):
        # folded tables pass through by shape (packed_cell_lookup derives
        # the fold factor from lane width; no metadata to thread)
        return {
            "tables": [tables[lvl]],
            "scales": None if scales is None else [scales[lvl]],
        }

    outs = []
    for lvl, res in enumerate(np.asarray(resolutions)):
        k = int(np.clip(int(stride_scale * s) // (2 * int(res)), 1, max_stride))
        if k == 1:
            f = packed_cell_lookup(
                level_packed(lvl),
                norm_positions.reshape(-1, 3),
                [int(res)],
                [sizes[lvl]],
                m,
                feats,
            ).reshape(m, r, s, feats)
            outs.append(f)
            continue
        # anchors at 0, k, ... — always place one anchor strictly past s-1
        # (clamped back to s-1) so every sample has a right bracket even
        # when k | s-1; the duplicated last anchor is harmless via the
        # max(t_right - t_left, eps) guard below (w clips to 0).
        pad = (-(s - 1)) % k or k
        na = (s - 1 + pad) // k + 1
        idx = np.minimum(np.arange(na) * k, s - 1)  # static anchor samples
        pos_a = norm_positions[:, idx]  # (R, A, 3)
        t_a = t_mid[:, idx]  # (R, A)
        f_a = packed_cell_lookup(
            level_packed(lvl),
            pos_a.reshape(-1, 3),
            [int(res)],
            [sizes[lvl]],
            m,
            feats,
        ).reshape(m, r, na, feats)
        # expand anchors to samples: sample s' in block b = s'//k brackets
        # anchors b, b+1 (static); lerp weight from t
        left = jnp.repeat(f_a[:, :, :-1], k, axis=2)[:, :, :s]
        right = jnp.repeat(f_a[:, :, 1:], k, axis=2)[:, :, :s]
        t_left = jnp.repeat(t_a[:, :-1], k, axis=1)[:, :s]
        t_right = jnp.repeat(t_a[:, 1:], k, axis=1)[:, :s]
        w = (t_mid - t_left) / jnp.maximum(t_right - t_left, 1e-12)
        w = jnp.clip(w, 0.0, 1.0)[None, :, :, None]
        outs.append(left * (1.0 - w) + right * w)
    return jnp.concatenate(outs, axis=-1)


class CellHashEncoding(nn.Module):
    """Cell-major multi-resolution hash grid (one gather per sample-level).

    Same constructor surface as :class:`HashEncoding`; owns a
    ``(L, n_rows, 128)`` packed ``cells`` param (cpr cells per row) so the
    array never lane-pads at rest.
    """

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
        assert 128 % (8 * self.features_per_level) == 0
        table_size = 2**self.log2_hashmap_size
        cpr = 128 // (8 * self.features_per_level)
        n_rows = (table_size + cpr - 1) // cpr
        cells = self.param(
            "cells",
            lambda key: jax.random.uniform(
                key,
                (self.num_levels, n_rows, 128),
                minval=-self.init_scale,
                maxval=self.init_scale,
            ),
        )
        resolutions = hash_grid_resolutions(
            self.num_levels, self.min_res, self.max_res
        )
        flat = positions.reshape(-1, 3)
        out = cell_lookup(
            cells, flat, resolutions, table_size, self.features_per_level
        )
        return out.reshape(*positions.shape[:-1], self.output_dim)


def face_consistency_loss(
    rows: jax.Array,
    res: int,
    table_size: int,
    key: jax.Array,
    num_vertices: int = 1024,
    features_per_level: int = 2,
) -> jax.Array:
    """Stochastic cross-face corner-consistency penalty for one CELL-layout
    level (ROUND4_PLAN item 5).

    Cell-major levels store the 8 corner feature vectors of each cell
    unshared, so adjacent cells may disagree on their common corners — the
    loss of tcnn's corner-sharing prior that costs sparse-view quality
    (12-view: corner 26.8 dB vs cell 22.1, STATUS.md). This penalty
    softly restores it: sample interior grid vertices, read the feature
    each of the 8 adjoining cells assigns to that vertex, and penalize the
    variance across them. Costs 8 row gathers per sampled vertex — at the
    default 1024 vertices, ~0.3% of a 4096-ray training batch's gathers.

    rows: (n_rows, 128) packed cell rows of the level (cpr cells/row,
    corner order c = 4x + 2y + z as in `cell_indices`).
    """
    if res < 2:
        return jnp.zeros(())
    feats = features_per_level
    block = 8 * feats
    cpr = 128 // block
    # interior vertices: all 8 adjoining cells exist (no validity masking)
    v = jax.random.randint(key, (num_vertices, 3), 1, res)
    vals = []
    for o in range(8):
        off = jnp.array([(o >> 2) & 1, (o >> 1) & 1, o & 1], jnp.int32)
        base = v - off[None]  # adjoining cell; vertex v is its corner o
        if res**3 <= table_size:
            idx = base[:, 0] + res * (base[:, 1] + res * base[:, 2])
        else:
            idx = _hash_corner_indices(base, jnp.int32(res), table_size)
        r = rows[idx // cpr]  # (K, 128)
        lane0 = (idx % cpr) * block + o * feats
        f = jnp.stack(
            [
                jnp.take_along_axis(r, (lane0 + ff)[:, None], axis=1)[:, 0]
                for ff in range(feats)
            ],
            -1,
        )  # (K, F)
        vals.append(f)
    stacked = jnp.stack(vals, 0)  # (8, K, F)
    return jnp.mean(jnp.var(stacked, axis=0))


def hybrid_is_dense(res: int, table_size: int) -> bool:
    """Hybrid-layout dense criterion.

    A hashed CELL level stores ``table_size * 8F`` params, so canonical
    corner storage of ``(res+1)^3 * F`` is no bigger as long as
    ``(res+1)^3 <= 8 * table_size`` — exact corner sharing and zero
    collisions at the cell layout's own memory budget. (The naive
    ``res^3 <= table_size`` rule left most levels unshared: measured 12-view
    sparse PSNR 23.4 vs corner's ~29 — the sharing prior matters well past
    the table-sized levels.)
    """
    return (int(res) + 1) ** 3 <= 8 * table_size


class HybridHashEncoding(nn.Module):
    """Dense-corner / hashed-cell hybrid grid (ROUND3_PLAN item 2).

    Levels whose cell grid fits the table (``res^3 <= table_size``) store a
    CANONICAL corner grid — exact tcnn corner sharing, collision-free, the
    protective prior sparse-view captures need (measured: at 12 views the
    corner layout reaches ~28.9 dB where unshared cells overfit at ~22.7,
    experiments/layout_quality.py) — expanded to cell-major rows by 8
    static slices per call (`dense_corner_to_cell_rows`, bandwidth-bound).
    Finer levels keep the cell-native hashed layout, so every level's
    lookup stays ONE row gather per (sample, level) and the fused ensemble
    eval path applies unchanged.

    Dense param cost is exact ((res+1)^3 F per level — LESS than both other
    layouts); hashed levels cost table_size * 8F as in the cell layout.
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    init_scale: float = 1e-4

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def level_plan(self) -> tuple[np.ndarray, list[bool]]:
        """(resolutions, is_dense per level) — static."""
        resolutions = hash_grid_resolutions(
            self.num_levels, self.min_res, self.max_res
        )
        table_size = 2**self.log2_hashmap_size
        return resolutions, [
            hybrid_is_dense(int(r), table_size) for r in resolutions
        ]

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        feats = self.features_per_level
        assert 128 % (8 * feats) == 0
        table_size = 2**self.log2_hashmap_size
        cpr = 128 // (8 * feats)
        resolutions, is_dense = self.level_plan()

        def uniform(scale):
            return lambda key, shape: jax.random.uniform(
                key, shape, minval=-scale, maxval=scale
            )

        n_hashed = sum(not d for d in is_dense)
        if n_hashed:
            n_rows = (table_size + cpr - 1) // cpr
            hashed_cells = self.param(
                "cells",
                uniform(self.init_scale),
                (n_hashed, n_rows, 128),
            )
        tables, sizes = [], []
        hi = 0
        for lvl, res in enumerate(int(r) for r in resolutions):
            if is_dense[lvl]:
                # dense cells address res^3 directly (cell_indices dense
                # path needs size == res^3 regardless of the table budget)
                grid = self.param(
                    f"corners_{lvl}",
                    uniform(self.init_scale),
                    (res + 1, res + 1, (res + 1) * feats),
                )
                tables.append(dense_corner_to_cell_rows(grid, res, feats))
                sizes.append(res**3)
            else:
                tables.append(hashed_cells[hi])
                sizes.append(table_size)
                hi += 1
        flat = positions.reshape(-1, 3)
        out = cell_lookup(tables, flat, resolutions, sizes, feats)
        return out.reshape(*positions.shape[:-1], self.output_dim)


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
