"""Fused 5-member ensemble render throughput across eval-table variants.

Re-establishes the post-reboot headline (PDF-v2 resampler + dispatch fix
landed since BENCH_r02) and measures the two opt-in levers on top of the
bf16 parity default:

  * table_dtype=int8  (per-level symmetric quantization, scale folded
    into the trilerp weight matmul — gathers run 2.8x faster than bf16
    at the 2^19 main grid, evidence gather_study)
  * main_stride_scale in {0, 4, 8} (anchor-strided coarse main levels)

Writes /root/repo/evidence/bench_variants_r3.json.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
    build_fused_ensemble_render,
    pack_ensemble_tables,
)
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params

CHUNK = 1 << 15
WARMUP = 6
ITERS = 5

config = NerfactoConfig(
    num_images=8,
    uncertainty_channels=1,
    near_plane=0.5,
    far_plane=6.0,
    background_color="white",
    use_appearance_embedding=False,
    proposal_field_type="hash",
    mixed_precision=True,
)
model = NerfactoModel(config)
stacked_params = init_ensemble_params(model, 5)

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


def bench(render, packed):
    def run(i):
        b = bundle._replace(origins=bundle.origins + 1e-6 * i)
        return render(stacked_params, packed, b)["rgb"]

    for i in range(WARMUP):
        float(jnp.sum(run(i)))
    t0 = time.perf_counter()
    outs = [run(WARMUP + i) for i in range(ITERS)]
    checksum = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return ITERS * CHUNK / dt


packed_bf16 = pack_ensemble_tables(model, stacked_params, table_dtype=jnp.bfloat16)
packed_int8 = pack_ensemble_tables(model, stacked_params, table_dtype=jnp.int8)

results = {}
for name, packed, stride in [
    ("bf16", packed_bf16, 0.0),
    ("int8", packed_int8, 0.0),
    ("bf16_stride8", packed_bf16, 8.0),
    ("int8_stride4", packed_int8, 4.0),
    ("int8_stride8", packed_int8, 8.0),
]:
    render = build_fused_ensemble_render(model, main_stride_scale=stride)
    rps = bench(render, packed)
    results[name] = {"rays_per_sec": round(rps, 1),
                     "vs_baseline_6e4": round(rps / 6e4, 3)}
    print(f"{name}: {rps:,.0f} rays/s ({rps/6e4:.3f}x)", flush=True)

out = Path("/root/repo/evidence/bench_variants_r3.json")
out.write_text(json.dumps(results, indent=2))
print("wrote", out, flush=True)
