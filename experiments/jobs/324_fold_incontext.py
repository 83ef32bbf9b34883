"""In-context throughput of folded eval tables (EXACT layout change).

Pairs with job 323 (standalone folded-gather physics): measures the full
fused 5-member ensemble render at the bench config with
pack_ensemble_tables(table_fold in {1, 2, 4}) x table_dtype {bf16, int8}.
Fold is a pure addressing change (tests assert bitwise-close equality),
so any win here applies to the EXACT-parity headline config with no
quality gate needed.

Writes /root/repo/evidence/fold_incontext_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import json
from pathlib import Path

import jax
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

results = {}
out_path = Path("/root/repo/evidence/fold_incontext_r4.json")

config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
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

for dt_name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
    for fold in (1, 2, 4):
        try:
            packed = EF.pack_ensemble_tables(
                model, stacked, table_dtype=dt, table_fold=fold
            )
            render = EF.build_fused_ensemble_render(model)
            dt_s = bench(render, stacked, packed, bundle)
            results[f"{dt_name}_fold{fold}_ms"] = round(dt_s * 1e3, 1)
            results[f"{dt_name}_fold{fold}_rays_per_s"] = round(CHUNK / dt_s, 0)
            print(f"{dt_name} fold{fold}: {dt_s*1e3:.1f} ms "
                  f"({CHUNK/dt_s:,.0f} rays/s)", flush=True)
        except Exception as e:
            results[f"{dt_name}_fold{fold}_ms"] = f"FAILED: {str(e)[:160]}"
            print(f"{dt_name} fold{fold} FAILED: {e}", flush=True)
        out_path.write_text(json.dumps(results, indent=2) + "\n")
        del packed
        jax.clear_caches()

print("JOB_324_DONE", flush=True)
