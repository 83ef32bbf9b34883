"""True in-context cost of the PDF resample kernels (fixes job 304's
confounded 'glue_only' ablation).

Job 304 faked resample_edges_tpu to `return u`, which made the upstream
proposal weights DEAD CODE — XLA DCE'd both proposal stages' gathers and
MLPs, so the 205 ms delta conflated the kernels with the whole proposal
chain. This fake CONSUMES w and edges (adds an epsilon-scaled reduction of
both to u), so everything upstream stays live and the delta isolates the
two pallas_call invocations alone.

Also measures a variant with stage outputs passed through
optimization_barrier (scheduling-shadow check).

Writes /root/repo/evidence/pdf_true_cost_r4.json.
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

import uncertainty_nerf_gs_tpu.ops.pdf_pallas as PP
import uncertainty_nerf_gs_tpu.ops.sampling as S
import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params
from r3_gather_ablation import bench, CHUNK

results = {}
out_path = Path("/root/repo/evidence/pdf_true_cost_r4.json")


def _flush():
    out_path.write_text(json.dumps(results, indent=2) + "\n")


config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
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

real_kernel = PP.resample_edges_tpu


def timed(tag):
    render = EF.build_fused_ensemble_render(model)
    dt = bench(render, stacked, packed, bundle)
    results[f"{tag}_ms"] = round(dt * 1e3, 1)
    results[f"{tag}_rays_per_s"] = round(CHUNK / dt, 0)
    print(f"{tag}: {dt*1e3:.1f} ms ({CHUNK/dt:,.0f} rays/s)", flush=True)
    _flush()


timed("real")

# fake that CONSUMES w and edges: upstream proposal work stays live
PP.resample_edges_tpu = lambda w, e, u, *a, **k: (
    u + 1e-20 * jnp.sum(w) + 1e-20 * jnp.sum(e)
)
jax.clear_caches()
try:
    timed("kernels_faked_inputs_live")
finally:
    PP.resample_edges_tpu = real_kernel

print("JOB_326_DONE", flush=True)
