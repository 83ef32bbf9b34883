"""In-context stage ablation of the fused ensemble render, round 4.

Two configs, both with the v2 sublane-major PDF kernel in place:
  * exact   — bf16 tables, no stride (the round-4 bench HEADLINE);
  * int8s8  — int8 tables + main stride 8 (fastest unvalidated config).

Same monkeypatch method as r3_gather_ablation.py: replace dynamic row
gathers with gather-free fakes (1-row table; keeps all lane-space math)
and the PDF resampler with uniform sampling, giving the honest in-context
cost of each stage. r3's exact split (550 ms = main 282 + prop 78 +
PDF 185 + rest 7) predates the PDF v2 kernel; this refreshes it and
guides the round-4 perf levers.

Writes /root/repo/evidence/stage_ablation_r4.json.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
import uncertainty_nerf_gs_tpu.ops.sampling as S
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params
from r3_gather_ablation import make_fakes, bench, CHUNK

config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
MAIN_T = 2 ** config.log2_hashmap_size
stacked = init_ensemble_params(model, 5)

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
real_pdf = EF.sample_pdf
fake_lookup, fake_strided = make_fakes()
results = {}


def fake_pdf(rb, spacing_edges, w, n_next, key=None):
    return S.sample_uniform(rb, n_next, key=None)


def route_strided(packed_t, norm_positions, t_mid, resolutions, table_size,
                  num_members, features_per_level=2, max_stride=8, **kw):
    fn = fake_strided if int(np.max(table_size)) == MAIN_T else real_strided
    return fn(packed_t, norm_positions, t_mid, resolutions, table_size,
              num_members, features_per_level, max_stride, **kw)


def route_lookup(packed_t, positions, resolutions, table_size, num_members,
                 features_per_level=2, **kw):
    fn = fake_lookup if int(np.max(table_size)) == MAIN_T else real_lookup
    return fn(packed_t, positions, resolutions, table_size, num_members,
              features_per_level, **kw)


for cfg_name, dtype, stride in (("exact", jnp.bfloat16, 0.0),
                                ("int8s8", jnp.int8, 8.0)):
    packed = EF.pack_ensemble_tables(model, stacked, table_dtype=dtype)
    r = {}

    def timed(tag):
        render = EF.build_fused_ensemble_render(
            model, main_stride_scale=stride)
        dt = bench(render, stacked, packed, bundle)
        r[tag] = round(dt * 1e3, 1)
        print(f"{cfg_name}/{tag:16s}: {dt*1e3:8.1f} ms "
              f"({CHUNK/dt:,.0f} rays/s)", flush=True)

    timed("full")
    EF.packed_cell_lookup_strided = route_strided
    EF.packed_cell_lookup = route_lookup
    timed("no_main_gather")
    EF.packed_cell_lookup_strided = fake_strided
    EF.packed_cell_lookup = fake_lookup
    timed("no_gathers")
    EF.packed_cell_lookup = real_lookup
    EF.packed_cell_lookup_strided = real_strided
    EF.sample_pdf = fake_pdf
    timed("no_pdf")
    EF.sample_pdf = real_pdf
    results[cfg_name] = r

with open("/root/repo/evidence/stage_ablation_r4.json", "w") as f:
    json.dump(results, f, indent=2)
    f.write("\n")
print("JOB_301_DONE", json.dumps(results), flush=True)
