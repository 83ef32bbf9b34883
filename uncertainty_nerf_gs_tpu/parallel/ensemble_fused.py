"""Fused shared-gather ensemble render (the round-2 throughput path).

The round-1 ensemble render ran M independent member forwards, so the hash
-grid row gathers — the measured single-chip bottleneck (XLA dynamic-gather
issue rate) — were paid M times. This path exploits two structural facts:

  1. members share the SAME sample positions when the proposal chain is
     shared, so the gather indices are identical across members;
  2. the cell-major grid layout (`ops/encodings.py`) packs a cell's whole
     trilinear payload in one row, so member features can be lane-stacked:
     one row gather of 8 corners x M members x F features serves the entire
     ensemble.

Pipeline per chunk: shared proposal hierarchy (per-member proposal
densities from ONE packed gather, averaged across members -> one PDF
resample), then the main field as ONE packed gather + vmapped member MLPs;
the compositing tail runs per member and feeds the reference combination
rule (`models/ensemble.py::combine_ensemble_outputs`).

Semantics deviation vs the reference's sequential loop
(`/root/reference/nerfuncertainty/models/ensemble/ensemble_pipeline.py:
155-157`): members see shared proposal samples (from the member-mean
proposal density) instead of their own. Validated against per-member
rendering in tests/test_ensemble_fused.py (PSNR/variance deltas).

Multi-chip: shard the RAY axis over the mesh ("data"); the packed tables
replicate (members are fused inside each chip's gather, so no "member"
axis remains to shard).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uncertainty_nerf_gs_tpu.models.ensemble import combine_ensemble_outputs
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops import raymarch
from uncertainty_nerf_gs_tpu.ops.encodings import (
    dense_corner_to_cell_rows,
    fold_packed_tables,
    hash_grid_resolutions,
    hybrid_is_dense,
    pack_member_cell_tables,
    packed_cell_lookup,
    packed_cell_lookup_strided,
    quantize_cell_tables_int8,
)
from uncertainty_nerf_gs_tpu.ops.sampling import (
    RayBundle,
    sample_pdf,
    sample_uniform,
)
from uncertainty_nerf_gs_tpu.ops.spatial import (
    contract_to_unit_cube,
    normalize_aabb,
)


def _aabb(cfg: NerfactoConfig):
    if cfg.aabb is not None:
        return jnp.asarray(cfg.aabb, jnp.float32)
    return jnp.asarray(((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)), jnp.float32)


def _normalize_positions(cfg: NerfactoConfig, positions: jax.Array):
    """Mirror of NerfactoField._normalize_positions as a pure function."""
    if cfg.use_scene_contraction:
        return contract_to_unit_cube(positions), jnp.ones(
            positions.shape[:-1], positions.dtype
        )
    normalized = normalize_aabb(positions, _aabb(cfg))
    inside = jnp.all((normalized >= 0.0) & (normalized <= 1.0), axis=-1)
    return jnp.clip(normalized, 0.0, 1.0), inside.astype(positions.dtype)


# ProposalDensityField always constructs its grid with its own
# features_per_level default (2) — NerfactoModel does not forward the main
# field's cfg.features_per_level to proposals (models/nerfacto.py:118-131),
# so the fused pack/lookup must not either (ADVICE r2).
_PROP_FEATS = 2


def _prop_grid_spec(cfg: NerfactoConfig, i: int) -> tuple[np.ndarray, int]:
    args = cfg.proposal_net_args[i]
    res = hash_grid_resolutions(
        args.get("num_levels", 5), 16, args.get("max_res", 128)
    )
    return res, 2 ** args.get("log2_hashmap_size", 17)


def _grid_sizes(resolutions, table_size: int, layout: str):
    """Per-level cell counts: res^3 for hybrid dense levels, table_size
    elsewhere (must match `HybridHashEncoding.level_plan`)."""
    if layout != "hybrid":
        return [table_size] * len(resolutions)
    return [
        int(r) ** 3 if hybrid_is_dense(int(r), table_size) else table_size
        for r in resolutions
    ]


def _pack_encoding(
    enc_params: dict,
    resolutions,
    table_size: int,
    feats: int,
    layout: str,
    table_dtype: Any,
):
    """Pack one encoding's stacked member params into fused eval rows.

    cell layout: ``cells`` (M, L, rows, 128) -> (L, T, lanes) array.
    hybrid: dense levels expand each member's canonical corner grid to
    cell rows first; returns a per-level list of (T_l, lanes) arrays.
    table_dtype=jnp.int8 quantizes per level (symmetric, scale folded
    into the lookup's trilerp weights — see `quantize_cell_tables_int8`
    for the measured 2.8x gather-rate rationale).
    """
    quantize = table_dtype == jnp.int8
    if quantize:
        table_dtype = None  # pack in f32, quantize per level (below)

    def maybe_quant(packed_l):
        """(T, lanes) f32 -> int8 rows + scale, inside the same jit so the
        f32 intermediate never persists (the full 16-level f32 pack is
        ~21 GB at parity scale — past HBM)."""
        if not quantize:
            return packed_l
        q = quantize_cell_tables_int8([packed_l])
        return q["tables"][0], q["scales"][0]

    def finish(per_level, stack_tables: bool):
        if not quantize:
            return jnp.stack(per_level) if stack_tables else per_level
        tables = [t for t, _ in per_level]
        scales = [s for _, s in per_level]
        return {
            "tables": jnp.stack(tables) if stack_tables else tables,
            "scales": scales,
        }

    if layout == "cell":

        @jax.jit
        def pack_cell(cells):
            per_level = []
            for lvl in range(cells.shape[1]):
                packed = pack_member_cell_tables(
                    cells[:, lvl : lvl + 1], table_size, feats,
                    dtype=table_dtype,
                )[0]
                per_level.append(maybe_quant(packed))
            return finish(per_level, stack_tables=True)

        return pack_cell(enc_params["cells"])
    assert layout == "hybrid"

    @jax.jit
    def pack(enc_params):
        per_level = []
        hi = 0
        for lvl, res in enumerate(int(r) for r in np.asarray(resolutions)):
            if hybrid_is_dense(res, table_size):
                # sequential over members: the expanded f32 cell rows of a
                # big dense level are ~2 GB per member at full scale — a
                # vmap would materialize all M at once
                rows = jax.lax.map(
                    lambda g, res=res: dense_corner_to_cell_rows(g, res, feats),
                    enc_params[f"corners_{lvl}"],
                )  # (M, rows, 128)
                packed = pack_member_cell_tables(
                    rows[:, None], res**3, feats, dtype=table_dtype
                )[0]
            else:
                packed = pack_member_cell_tables(
                    enc_params["cells"][:, hi : hi + 1],
                    table_size,
                    feats,
                    dtype=table_dtype,
                )[0]
                hi += 1
            per_level.append(maybe_quant(packed))
        return finish(per_level, stack_tables=False)

    return pack(enc_params)


def pack_ensemble_tables(
    model: NerfactoModel,
    stacked_params: Any,
    table_dtype: Any = None,
    table_fold: int = 1,
    table_split: bool = False,
) -> dict[str, Any]:
    """One-time repack of stacked member grid tables into fused eval rows.

    Requires ``grid_layout`` in {"cell", "hybrid"}. Returns
    ``{"field": (L, T, lanes) or per-level list, "proposal_i": ... or None
    (mlp proposals)}``.

    ``table_fold`` > 1 folds that many cells into each row (EXACT layout
    change; see `fold_packed_tables` — moves the big main-grid gather
    operand under XLA's size cliff).

    ``table_split`` lane-splits each level into <= 32 MB sub-tables with
    the pad lanes dropped (EXACT; see `split_packed_tables` — each
    sub-gather runs in the fast (<= 33.5 MB) lowering mode;
    evidence/gather_overlap_r5.json holds the physics).
    """
    cfg = model.config
    layout = cfg.grid_layout
    assert layout in ("cell", "hybrid"), "fused ensemble needs cell rows"
    levels = {"field": cfg.num_levels}
    out: dict[str, Any] = {}
    out["field"] = _pack_encoding(
        stacked_params["field"]["encoding"],
        hash_grid_resolutions(cfg.num_levels, cfg.base_res, cfg.max_res),
        2**cfg.log2_hashmap_size,
        cfg.features_per_level,
        layout,
        table_dtype,
    )
    for i in range(len(cfg.proposal_net_args)):
        p = stacked_params.get(f"proposal_{i}", {})
        if "encoding" in p:
            res_i, tsize = _prop_grid_spec(cfg, i)
            out[f"proposal_{i}"] = _pack_encoding(
                p["encoding"], res_i, tsize, _PROP_FEATS, layout, table_dtype
            )
            levels[f"proposal_{i}"] = len(res_i)
        else:
            out[f"proposal_{i}"] = None  # mlp proposal: gather-free
    if table_fold > 1:
        for k, n_lvl in levels.items():
            out[k] = fold_packed_tables(out[k], table_fold, n_lvl)
    if table_split:
        from uncertainty_nerf_gs_tpu.ops.encodings import split_packed_tables

        m = jax.tree.leaves(stacked_params["field"]["encoding"])[0].shape[0]
        for k, n_lvl in levels.items():
            feats = cfg.features_per_level if k == "field" else _PROP_FEATS
            if out[k] is not None:
                out[k] = split_packed_tables(
                    out[k], n_lvl, real_lanes=8 * m * feats
                )
    return out


def build_fused_ensemble_render(
    model: NerfactoModel,
    mesh: Mesh | None = None,
    parity_mode: bool = True,
    proposal_anchor_stride: bool = True,
    main_stride_scale: float = 0.0,
) -> Callable:
    """Returns jitted ``render(stacked_params, packed_tables, ray_bundle)``.

    ``packed_tables`` from :func:`pack_ensemble_tables` (built once per
    checkpoint, not per chunk). With a mesh, the ray axis shards over
    "data" and the tables/params replicate.

    ``proposal_anchor_stride``: evaluate coarse PROPOSAL grid levels at
    strided ray anchors and lerp along the ray (see
    `packed_cell_lookup_strided`) — cuts proposal gathers ~40% for a
    sub-0.1 dB render difference (validated in tests); the main field is
    exact unless ``main_stride_scale`` is set.

    ``main_stride_scale`` (0 = off): also stride the MAIN field's coarse
    levels. Post-proposal samples concentrate into a small fraction of the
    ray, so the uniform-spacing stride rule never engages at S=48; a
    stride_scale of ~4-8 models that concentration. Opt-in because the
    main field feeds the MLPs directly — validate against an exact render
    on a trained model before enabling (experiments/r3_main_stride.py).
    """
    cfg = model.config
    F = cfg.features_per_level
    main_res = hash_grid_resolutions(cfg.num_levels, cfg.base_res, cfg.max_res)
    main_T = _grid_sizes(main_res, 2**cfg.log2_hashmap_size, cfg.grid_layout)

    def render(stacked_params, packed, ray_bundle: RayBundle):
        m = jax.tree.leaves(stacked_params)[0].shape[0]
        # Intentionally identical to the non-fused path
        # (models/nerfacto.py::render, NearFarCollider semantics): nerfacto
        # clamps every ray to the CONFIG near/far planes, discarding any
        # dataparser-provided per-ray bounds. The fused-vs-sequential parity
        # tests rely on both paths doing the same thing here.
        rb = ray_bundle._replace(
            nears=jnp.full_like(ray_bundle.nears, cfg.near_plane),
            fars=jnp.full_like(ray_bundle.fars, cfg.far_plane),
        )
        num_prop = len(cfg.proposal_net_args)

        # --- shared proposal hierarchy --------------------------------
        rs = sample_uniform(rb, cfg.num_proposal_samples[0], key=None)
        for i in range(num_prop):
            pos = rs.positions  # (R, S, 3)
            norm, sel = _normalize_positions(cfg, pos)
            tbl = packed[f"proposal_{i}"]
            if tbl is not None:
                res_i, tsize_i = _prop_grid_spec(cfg, i)
                tsize_i = _grid_sizes(res_i, tsize_i, cfg.grid_layout)
                if proposal_anchor_stride:
                    feats = packed_cell_lookup_strided(
                        tbl, norm, rs.midpoints, res_i, tsize_i, m, _PROP_FEATS
                    )  # (M, R, S, LF)
                else:
                    feats = packed_cell_lookup(
                        tbl, norm.reshape(-1, 3), res_i, tsize_i, m, _PROP_FEATS
                    ).reshape(m, *pos.shape[:-1], -1)  # (M, R, S, LF)

                def member_density(params, f, i=i, sel=sel):
                    return model.apply(
                        {"params": params},
                        f,
                        sel,
                        method=lambda mdl, f, s: mdl.proposal_fields[
                            i
                        ].density_from_feats(f, s),
                    )

                d = jax.vmap(member_density, in_axes=(0, 0))(
                    stacked_params, feats
                )  # (M, R, S)
            else:  # gather-free mlp proposal: vmap the full field
                def member_density_mlp(params, i=i, pos=pos):
                    return model.apply(
                        {"params": params},
                        pos,
                        method=lambda mdl, p: mdl.proposal_fields[i](p),
                    )

                d = jax.vmap(member_density_mlp)(stacked_params)
            d_shared = jnp.mean(d, axis=0)  # member-mean proposal density
            w = raymarch.render_weights(d_shared, rs.deltas)
            n_next = (
                cfg.num_proposal_samples[i + 1]
                if i + 1 < num_prop
                else cfg.num_nerf_samples
            )
            rs = sample_pdf(rb, rs.spacing_edges, w, n_next, key=None)

        # --- main field: one packed gather + vmapped member MLPs -------
        pos = rs.positions  # (R, S, 3)
        norm, sel = _normalize_positions(cfg, pos)
        if main_stride_scale > 0.0:
            feats = packed_cell_lookup_strided(
                packed["field"], norm, rs.midpoints, main_res, main_T, m, F,
                stride_scale=main_stride_scale,
            )
        else:
            feats = packed_cell_lookup(
                packed["field"], norm.reshape(-1, 3), main_res, main_T, m, F
            ).reshape(m, *pos.shape[:-1], -1)

        def member_field(params, f):
            return model.apply(
                {"params": params},
                f,
                sel,
                rb.directions,
                rb.camera_indices,
                method=lambda mdl, f, s, d, ci: mdl.field.forward_from_feats(
                    f, s, d, ci, use_average_appearance=True
                ),
            )

        fo = jax.vmap(member_field, in_axes=(0, 0))(stacked_params, feats)

        steps = rs.midpoints
        deltas = rs.deltas

        def member_tail(density_raw, rgb, unc):
            density = cfg.average_init_density * density_raw
            weights = raymarch.render_weights(density, deltas)
            if cfg.background_color == "white":
                background = jnp.ones(3)
            elif cfg.background_color == "last_sample":
                background = jax.lax.stop_gradient(rgb[..., -1, :])
            else:
                background = jnp.zeros(3)
            out = {
                "rgb": raymarch.render_rgb(weights, rgb, background),
                "accumulation": raymarch.render_accumulation(weights),
            }
            depth = raymarch.render_median_depth(weights, steps)
            out["depth"] = depth
            out["expected_depth"] = raymarch.render_expected_depth(weights, steps)
            dv = raymarch.depth_variance(weights, steps, depth)
            out["depth_var"] = dv
            out["depth_std"] = jnp.sqrt(dv)
            if unc is not None:
                betas = jnp.nan_to_num(unc, nan=0.0)
                rv = raymarch.render_uncertainty(betas, weights**2)
                out["rgb_var"] = rv
                out["rgb_std"] = jnp.sqrt(rv)
            return out

        stacked = jax.vmap(member_tail)(
            fo.density, fo.rgb, fo.uncertainty
        )
        return combine_ensemble_outputs(stacked, parity_mode=parity_mode)

    if mesh is None:
        return jax.jit(render)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        render,
        in_shardings=(repl, repl, data),
        out_shardings=repl,
    )
