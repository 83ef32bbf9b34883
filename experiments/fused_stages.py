"""Stage ablation of the REAL fused ensemble render: time prefixes of the
actual pipeline to see where the wall-clock goes (standalone probes of the
same ops mislead — XLA fuses differently in context)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops import raymarch
from uncertainty_nerf_gs_tpu.ops.encodings import (
    hash_grid_resolutions,
    packed_cell_lookup,
)
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle, sample_pdf, sample_uniform
from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
    _normalize_positions,
    _prop_grid_spec,
    pack_ensemble_tables,
)
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params

CHUNK = 1 << 13
ITERS = 5
M, F = 5, 2


def bench(fn, label, *args):
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    print(f"{label:44s}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    config = NerfactoConfig(
        num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
        background_color="white", use_appearance_embedding=False,
        proposal_field_type="hash",
    )
    model = NerfactoModel(config)
    stacked = init_ensemble_params(model, M)
    packed = pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)
    cfg = config
    main_res = hash_grid_resolutions(cfg.num_levels, cfg.base_res, cfg.max_res)
    main_T = 2**cfg.log2_hashmap_size

    rng = np.random.default_rng(0)
    d = rng.normal(size=(CHUNK, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb0 = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((CHUNK,), cfg.near_plane),
        fars=jnp.full((CHUNK,), cfg.far_plane),
        camera_indices=jnp.zeros((CHUNK,), jnp.int32),
    )

    def pipeline(i, stacked, packed, stage: int):
        rb = rb0._replace(origins=rb0.origins + 1e-6 * i)
        rs = sample_uniform(rb, cfg.num_proposal_samples[0], key=None)
        acc = jnp.float32(0.0)
        for pi in range(2):
            pos = rs.positions
            norm, sel = _normalize_positions(cfg, pos)
            res_i, tsize_i = _prop_grid_spec(cfg, pi)
            feats = packed_cell_lookup(
                packed[f"proposal_{pi}"], norm.reshape(-1, 3), res_i, tsize_i, M, F
            ).reshape(M, *pos.shape[:-1], -1)
            if stage == 2 * pi:  # encode only
                return feats.sum() + acc

            def member_density(params, f, pi=pi, sel=sel):
                return model.apply(
                    {"params": params}, f, sel,
                    method=lambda mdl, f, s: mdl.proposal_fields[pi].density_from_feats(f, s),
                )

            dend = jax.vmap(member_density)(stacked, feats)
            d_shared = jnp.mean(dend, 0)
            w = raymarch.render_weights(d_shared, rs.deltas)
            n_next = cfg.num_proposal_samples[1] if pi == 0 else cfg.num_nerf_samples
            rs = sample_pdf(rb, rs.spacing_edges, w, n_next, key=None)
            if stage == 2 * pi + 1:  # through this pdf
                return rs.spacing_edges.sum() + acc
        pos = rs.positions
        norm, sel = _normalize_positions(cfg, pos)
        feats = packed_cell_lookup(
            packed["field"], norm.reshape(-1, 3), main_res, main_T, M, F
        ).reshape(M, *pos.shape[:-1], -1)
        if stage == 4:
            return feats.sum()

        def member_field(params, f):
            return model.apply(
                {"params": params}, f, sel, rb.directions, rb.camera_indices,
                method=lambda mdl, f, s, dd, ci: mdl.field.forward_from_feats(
                    f, s, dd, ci, use_average_appearance=True),
            )

        fo = jax.vmap(member_field)(stacked, feats)
        if stage == 5:
            return fo.rgb.sum() + fo.density.sum()
        density = cfg.average_init_density * fo.density
        weights = raymarch.render_weights(density, rs.deltas)
        rgb = raymarch.render_rgb(weights, fo.rgb, jnp.ones(3))
        steps_b = jnp.broadcast_to(rs.midpoints, weights.shape)
        depth = raymarch.render_median_depth(weights, steps_b)
        dv = raymarch.depth_variance(weights, steps_b, depth)
        rv = raymarch.render_uncertainty(jnp.nan_to_num(fo.uncertainty), weights**2)
        return rgb.sum() + depth.sum() + dv.sum() + rv.sum()

    labels = [
        "prop1 encode only",
        "prop1 + pdf->96",
        "prop2 encode",
        "prop2 + pdf->48",
        "+ main encode",
        "+ member MLPs",
        "full (tails incl.)",
    ]
    import os
    wanted = [int(x) for x in os.environ.get("STAGES", "3,4,6").split(",")]
    for stage, label in enumerate(labels):
        if stage not in wanted:
            continue
        fn = jax.jit(lambda i, s, p, st=stage: pipeline(i, s, p, st))
        bench(fn, f"stage {stage}: {label}", stacked, packed)




def pdf_ablation():
    """Full fused render with sample_pdf stubbed to uniform re-edges -> the
    exact in-context cost of the CDF inversions."""
    import uncertainty_nerf_gs_tpu.ops.sampling as sampling
    from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
        build_fused_ensemble_render,
    )

    config = NerfactoConfig(
        num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
        background_color="white", use_appearance_embedding=False,
        proposal_field_type="hash",
    )
    model = NerfactoModel(config)
    stacked = init_ensemble_params(model, M)
    packed = pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(CHUNK, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb0 = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((CHUNK,), config.near_plane),
        fars=jnp.full((CHUNK,), config.far_plane),
        camera_indices=jnp.zeros((CHUNK,), jnp.int32),
    )

    real_pdf = sampling.sample_pdf
    render_real = build_fused_ensemble_render(model)

    def run_real(i):
        b = rb0._replace(origins=rb0.origins + 1e-6 * i)
        return render_real(stacked, packed, b)["rgb"]

    bench(run_real, "full render (real sample_pdf)")

    def stub_pdf(ray_bundle, s_edges, weights, num_samples, key=None, **kw):
        # depends on weights so nothing upstream is DCE'd
        r, nb = weights.shape
        base = jnp.linspace(0.0, 1.0, num_samples + 1)
        tweak = (weights.sum(-1, keepdims=True) * 1e-12)
        edges = jnp.clip(base[None, :] + tweak, 0.0, 1.0)
        edges = jnp.broadcast_to(edges, (r, num_samples + 1))
        return sampling._edges_to_samples(
            ray_bundle, edges, sampling.spacing_piecewise,
            sampling.spacing_piecewise_inv)

    sampling.sample_pdf = stub_pdf
    try:
        import importlib
        import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as ef
        importlib.reload(ef)
        render_stub = ef.build_fused_ensemble_render(model)

        def run_stub(i):
            b = rb0._replace(origins=rb0.origins + 1e-6 * i)
            return render_stub(stacked, packed, b)["rgb"]

        bench(run_stub, "full render (stubbed sample_pdf)")
    finally:
        sampling.sample_pdf = real_pdf


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("PDF_ABLATION"):
        pdf_ablation()
    else:
        main()
