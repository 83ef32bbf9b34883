"""In-context A/B of post-gather int8 dequant formulations (re-run of
job 307, whose standalone section inlined a 256MB host-constant table into
the compile payload -> HTTP 413 and a polluted 6M rows/s reading; the
standalone question now lives in job 334 with device-built tables).

Variants at the exact bench config (5-member fused ensemble, int8 tables):
  base    — rows.astype(f32), f32 lane matmuls (current);
  barrier — optimization_barrier between gather and dequant (stops XLA
            fusing the convert into the gather consumer, which may force
            the slow wide-row gather lowering);
  bf16    — dequant to bf16 + bf16 lane matmuls.

Writes /root/repo/evidence/int8_gather_variants_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import uncertainty_nerf_gs_tpu.ops.encodings as E
import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params
from r3_gather_ablation import bench, CHUNK

results = {}
out_json = Path("/root/repo/evidence/int8_gather_variants_r4.json")
rng = np.random.default_rng(0)

config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
stacked = init_ensemble_params(model, 5)
packed = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.int8)

d = rng.normal(size=(CHUNK, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
bundle = RayBundle(
    origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
    directions=jnp.asarray(d, jnp.float32),
    nears=jnp.full((CHUNK,), config.near_plane),
    fars=jnp.full((CHUNK,), config.far_plane),
    camera_indices=jnp.zeros((CHUNK,), jnp.int32),
)

orig_lookup = E.packed_cell_lookup


def make_variant(mode):
    def lookup(packed_t, positions, resolutions, table_size, num_members,
               features_per_level=2):
        feats = features_per_level
        m = num_members
        mf = m * feats
        levels = len(np.asarray(resolutions))
        tables, scales = E._unpack_quantized(packed_t)
        tables, sizes = E._per_level_tables(tables, table_size, levels)
        lanes = tables[0].shape[-1]
        n = positions.shape[0]
        corner_b, corner_s = E._lerp_matrices(lanes, mf, mf)
        outs = []
        for lvl, res in enumerate(np.asarray(resolutions)):
            idx, wt = E.cell_indices(positions, int(res), sizes[lvl])
            rows = tables[lvl][idx]
            if mode == "barrier":
                rows = jax.lax.optimization_barrier(rows)
            if scales is not None:
                if mode == "bf16":
                    wl = ((wt @ corner_b) * scales[lvl]).astype(jnp.bfloat16)
                    rows = rows.astype(jnp.bfloat16)
                else:
                    wl = (wt @ corner_b) * scales[lvl]
                    rows = rows.astype(jnp.float32)
            else:
                wl = wt.astype(rows.dtype) @ corner_b.astype(rows.dtype)
            outs.append(((rows * wl) @ corner_s.astype(rows.dtype)))
        all_lvls = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        perms = np.zeros((m, levels * mf, levels * feats), np.float32)
        for mm in range(m):
            for lvl in range(levels):
                for f in range(feats):
                    perms[mm, lvl * mf + mm * feats + f, lvl * feats + f] = 1.0
        return jnp.einsum("nk,mko->mno", all_lvls, jnp.asarray(perms))

    return lookup


for mode in ("base", "barrier", "bf16"):
    E.packed_cell_lookup = orig_lookup if mode == "base" else make_variant(mode)
    EF.packed_cell_lookup = E.packed_cell_lookup
    render = EF.build_fused_ensemble_render(model)
    dt_s = bench(render, stacked, packed, bundle)
    results[f"incontext_int8_{mode}_ms"] = round(dt_s * 1e3, 1)
    results[f"incontext_int8_{mode}_rays_per_s"] = round(CHUNK / dt_s, 0)
    print(f"in-context int8/{mode}: {dt_s*1e3:.1f} ms "
          f"({CHUNK/dt_s:,.0f} rays/s)", flush=True)
    out_json.write_text(json.dumps(results, indent=2) + "\n")
    jax.clear_caches()
E.packed_cell_lookup = orig_lookup
EF.packed_cell_lookup = orig_lookup

print("JOB_335_DONE", flush=True)
