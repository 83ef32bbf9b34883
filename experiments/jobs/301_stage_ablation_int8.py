"""In-context stage ablation of the fused render at the NEW headline
config (int8 eval tables + main_stride_scale=8, job 201: 107k rays/s).

Same monkeypatch method as r3_gather_ablation.py: replace the dynamic row
gathers with gather-free fakes (1-row table; keeps all lane-space math),
and the PDF resampler with uniform sampling, to get the honest in-context
cost of each remaining stage.  Guides the next perf lever.

Writes /root/repo/evidence/stage_ablation_int8_r4.json.
"""

import json
import time

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

MAIN_T = None  # set below

config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
MAIN_T = 2 ** config.log2_hashmap_size
stacked = init_ensemble_params(model, 5)
packed = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.int8)

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
    render = EF.build_fused_ensemble_render(model, main_stride_scale=8.0)
    dt = bench(render, stacked, packed, bundle)
    results[tag] = round(dt * 1e3, 1)
    print(f"{tag:18s}: {dt*1e3:8.1f} ms  ({CHUNK/dt:,.0f} rays/s)", flush=True)


timed("full")

# main-vs-proposal split: with stride engaged BOTH call sites use the
# strided variant; route by table_size (main = 2^19, proposals = 2^17).
def route_strided(packed_t, norm_positions, t_mid, resolutions, table_size,
                  num_members, features_per_level=2, max_stride=8, **kw):
    fn = fake_strided if int(np.max(table_size)) == MAIN_T else real_strided
    return fn(packed_t, norm_positions, t_mid, resolutions, table_size,
              num_members, features_per_level, max_stride, **kw)


EF.packed_cell_lookup_strided = route_strided
EF.packed_cell_lookup = fake_lookup  # main non-strided site, if hit
timed("no_main_gather")

EF.packed_cell_lookup_strided = fake_strided
timed("no_gathers")

EF.packed_cell_lookup = real_lookup
EF.packed_cell_lookup_strided = real_strided

real_pdf = EF.sample_pdf


def fake_pdf(rb, spacing_edges, w, n_next, key=None):
    return S.sample_uniform(rb, n_next, key=None)


EF.sample_pdf = fake_pdf
timed("no_pdf")
EF.sample_pdf = real_pdf

with open("/root/repo/evidence/stage_ablation_int8_r4.json", "w") as f:
    json.dump(results, f, indent=2)
print("JOB_205_DONE", json.dumps(results), flush=True)
