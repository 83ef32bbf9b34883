"""Throughput of every gate-candidate config at the bench shape (pairs
with job 320's quality gate to pick the round-4 bench.py headline).

Fused 5-member ensemble render, 32k-ray chunk, reference-parity scale,
bf16 AMP parity mode. Writes /root/repo/evidence/bench_variants_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import json

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params
from r3_gather_ablation import bench, CHUNK

config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
stacked = init_ensemble_params(model, 5)
packed_bf16 = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)
packed_int8 = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.int8)

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

VARIANTS = [
    ("bf16_exact", packed_bf16, 0.0),
    ("int8_exact", packed_int8, 0.0),
    ("int8_stride2", packed_int8, 2.0),
    ("int8_stride3", packed_int8, 3.0),
    ("int8_stride4", packed_int8, 4.0),
    ("int8_stride8", packed_int8, 8.0),
]
results = {}
for name, packed, stride in VARIANTS:
    render = EF.build_fused_ensemble_render(model, main_stride_scale=stride)
    dt = bench(render, stacked, packed, bundle)
    results[name] = {
        "rays_per_sec": round(CHUNK / dt, 0),
        "vs_baseline": round(CHUNK / dt / 6.0e4, 3),
    }
    print(f"{name}: {CHUNK/dt:,.0f} rays/s ({CHUNK/dt/6e4:.3f}x)", flush=True)

out = {
    "description": "Fused 5-member ensemble render throughput across "
                   "eval-table/stride variants (32k chunk, parity scale, "
                   "bf16 AMP). Pairs with int8_stride_quality_r4.json.",
    "baseline_rays_per_sec": 6.0e4,
    "results": results,
}
with open("/root/repo/evidence/bench_variants_r4.json", "w") as f:
    json.dump(out, f, indent=2)
    f.write("\n")
print("JOB_325_DONE", flush=True)
