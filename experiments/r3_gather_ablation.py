"""In-context ablation of the fused render's gather cost (ONE process).

Monkeypatches `packed_cell_lookup` / `packed_cell_lookup_strided` inside
`parallel.ensemble_fused` with gather-free fakes (row 0 broadcast — keeps
every downstream lane-space matmul, removes only the dynamic row gather),
then times:

  full            — the real fused render (bench config);
  no_main_gather  — main-field lookup faked, proposals real;
  no_gathers      — all grid lookups faked;
  no_pdf          — real gathers, PDF resampling replaced by uniform.

The deltas give the honest in-context cost of each stage (standalone
microbenches mislead: XLA schedules/fuses differently in context).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WARMUP, ITERS = 6, 5
CHUNK = 1 << 15


def bench(render, stacked, packed, bundle) -> float:
    def run(i):
        b = bundle._replace(origins=bundle.origins + 1e-6 * i)
        return render(stacked, packed, b)["rgb"]

    for i in range(WARMUP):
        float(jnp.sum(run(i)))
    t0 = time.perf_counter()
    outs = [run(WARMUP + i) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    return dt


def make_fakes():
    from uncertainty_nerf_gs_tpu.ops import encodings as E

    def fake_lookup(packed, positions, resolutions, table_size, num_members,
                    features_per_level=2, _real=E.packed_cell_lookup, **kw):
        levels = len(np.asarray(resolutions))
        packed, _scales = E._unpack_quantized(packed)  # int8 dict form
        tables, _ = E._per_level_tables(packed, table_size, levels)
        # same lane-space math, idx forced to 0 via a 1-row table and
        # table_size=1 (dense index mod 1 -> 0): zero dynamic gather
        one_rows = [t[0:1] for t in tables]
        return _real(one_rows, positions, resolutions, [1] * levels,
                     num_members, features_per_level, **kw)

    def fake_strided(packed, norm_positions, t_mid, resolutions, table_size,
                     num_members, features_per_level=2, max_stride=8,
                     _real=E.packed_cell_lookup_strided, **kw):
        levels = len(np.asarray(resolutions))
        packed, _scales = E._unpack_quantized(packed)  # int8 dict form
        tables, _ = E._per_level_tables(packed, table_size, levels)
        one_rows = [t[0:1] for t in tables]
        return _real(one_rows, norm_positions, t_mid, resolutions,
                     [1] * levels, num_members, features_per_level,
                     max_stride, **kw)

    return fake_lookup, fake_strided


def main():
    import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
    from uncertainty_nerf_gs_tpu.models.nerfacto import (
        NerfactoConfig,
        NerfactoModel,
    )
    from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
    from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import (
        init_ensemble_params,
    )

    config = NerfactoConfig(
        num_images=8,
        uncertainty_channels=1,
        near_plane=0.5,
        far_plane=6.0,
        background_color="white",
        use_appearance_embedding=False,
        proposal_field_type="hash",
    )
    model = NerfactoModel(config)
    stacked = init_ensemble_params(model, 5)
    packed = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(CHUNK, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((CHUNK,), config.near_plane),
        fars=jnp.full((CHUNK,), config.far_plane),
        camera_indices=jnp.zeros((CHUNK,), jnp.int32),
    )

    real_lookup = EF.packed_cell_lookup
    real_strided = EF.packed_cell_lookup_strided
    fake_lookup, fake_strided = make_fakes()
    results = {}

    def timed(tag):
        render = EF.build_fused_ensemble_render(model)
        dt = bench(render, stacked, packed, bundle)
        results[tag] = round(dt * 1e3, 1)
        print(f"{tag:18s}: {dt*1e3:8.1f} ms  ({CHUNK/dt:,.0f} rays/s)",
              flush=True)

    timed("full")

    # main-field gather only faked: patch lookup used at the main call site.
    # The main call is the non-strided packed_cell_lookup on packed["field"];
    # proposals use the strided variant (default) — so patching the
    # non-strided fn isolates the main field.
    EF.packed_cell_lookup = fake_lookup
    timed("no_main_gather")

    EF.packed_cell_lookup_strided = fake_strided
    timed("no_gathers")

    EF.packed_cell_lookup = real_lookup
    EF.packed_cell_lookup_strided = real_strided

    # PDF ablation: uniform re-sampling instead of CDF inversion
    import uncertainty_nerf_gs_tpu.ops.sampling as S

    real_pdf = EF.sample_pdf

    def fake_pdf(rb, spacing_edges, w, n_next, key=None):
        return S.sample_uniform(rb, n_next, key=None)

    EF.sample_pdf = fake_pdf
    timed("no_pdf")
    EF.sample_pdf = real_pdf

    print(json.dumps(results), flush=True)
    with open("/tmp/r3_gather_ablation.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
